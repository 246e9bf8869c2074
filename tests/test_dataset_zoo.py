"""Dataset-class tests over synthetic on-disk fixtures (no real datasets)."""

import os

import numpy as np
import pytest
from PIL import Image

from stereo_toolbox_tpu.datasets import (KITTI2015_Dataset,
                                         SceneFlow_Dataset,
                                         Sintel_Dataset,
                                         Holopix50k_Dataset)


def _write_png(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def _write_pfm(path, data):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(f"Pf\n{data.shape[1]} {data.shape[0]}\n-1.0\n".encode())
        f.write(np.flipud(data).astype("<f4").tobytes())


def _rgb(h=100, w=120, seed=0):
    return np.random.RandomState(seed).randint(
        0, 255, (h, w, 3), dtype=np.uint8)


@pytest.fixture
def sceneflow_root(tmp_path):
    root = tmp_path / "sf"
    lists = tmp_path / "lists"
    rows = []
    for i in range(3):
        left = f"frames_finalpass/A/{i}/left/{i:04d}.png"
        right = f"frames_finalpass/A/{i}/right/{i:04d}.png"
        disp = f"disparity/A/{i}/left/{i:04d}.pfm"
        _write_png(str(root / left), _rgb(seed=i))
        _write_png(str(root / right), _rgb(seed=i + 10))
        _write_pfm(str(root / disp),
                   np.full((100, 120), 7.5, np.float32))
        rows.append(f"{left} {right} {disp}")
    os.makedirs(lists, exist_ok=True)
    (lists / "test_finalpass.txt").write_text("\n".join(rows) + "\n")
    return str(root), str(lists / "test_finalpass.txt")


def test_sceneflow_dataset_eval(sceneflow_root):
    root, manifest = sceneflow_root
    ds = SceneFlow_Dataset("test_finalpass", training=False, root_dir=root,
                           manifest=manifest)
    assert len(ds) == 3
    s = ds[0]
    # padded to multiples of 96: 100x120 -> 192x192
    assert s["left"].shape == (192, 192, 3)
    assert s["gt_disp"].shape == (192, 192)
    # GT visible in non-padded region (bottom-left)
    assert s["gt_disp"][191, 0] == 7.5
    assert np.isnan(s["noc_mask"]).all()


def test_sceneflow_dataset_train_crop(sceneflow_root):
    root, manifest = sceneflow_root
    ds = SceneFlow_Dataset("train_finalpass", training=True, root_dir=root,
                           manifest=manifest, crop_size=(64, 96))
    s = ds[1]
    assert s["left"].shape == (64, 96, 3)
    assert s["raw_left"].dtype == np.float32
    assert 0 <= s["raw_left"].min() and s["raw_left"].max() <= 1


def test_kitti_dataset(tmp_path):
    root = tmp_path / "KITTI_2015"
    rows = []
    for i in range(2):
        l = f"training/image_2/{i:06d}_10.png"
        r = f"training/image_3/{i:06d}_10.png"
        d = f"training/disp_occ_0/{i:06d}_10.png"
        noc = f"training/disp_noc_0/{i:06d}_10.png"
        _write_png(str(root / l), _rgb(96, 96, i))
        _write_png(str(root / r), _rgb(96, 96, i + 5))
        disp16 = (np.full((96, 96), 12.0) * 256).astype(np.uint16)
        _write_png(str(root / d), disp16)
        _write_png(str(root / noc), disp16)
        rows.append(f"{l} {r} {d}")
    manifest = tmp_path / "train.txt"
    manifest.write_text("\n".join(rows) + "\n")
    ds = KITTI2015_Dataset("train", training=False, root_dir=str(root),
                           manifest=str(manifest))
    s = ds[0]
    assert s["gt_disp"][95, 0] == 12.0
    assert s["noc_mask"][95, 0] == 1.0  # noc file disparity > 0


def test_sintel_packed_rgb(tmp_path):
    root = tmp_path / "Sintel"
    l = "clean_left/a/frame_0001.png"
    r = "clean_right/a/frame_0001.png"
    d = "disparities/a/frame_0001.png"
    _write_png(str(root / l), _rgb(96, 96, 0))
    _write_png(str(root / r), _rgb(96, 96, 1))
    packed = np.zeros((96, 96, 3), np.uint8)
    packed[..., 0] = 2  # disparity = 8.0
    _write_png(str(root / d), packed)
    manifest = tmp_path / "m.txt"
    manifest.write_text(f"{l} {r} {d}\n")
    ds = Sintel_Dataset("train_clean", training=False, root_dir=str(root),
                        manifest=str(manifest))
    assert ds[0]["gt_disp"][0, 0] == 8.0


def test_holopix_no_gt(tmp_path):
    root = tmp_path / "Holopix50k"
    l, r = "train/left/0.png", "train/right/0.png"
    _write_png(str(root / l), _rgb(96, 96, 0))
    _write_png(str(root / r), _rgb(96, 96, 1))
    manifest = tmp_path / "m.txt"
    manifest.write_text(f"{l} {r}\n")
    ds = Holopix50k_Dataset("train", training=True, root_dir=str(root),
                            manifest=str(manifest), crop_size=(64, 64))
    s = ds[0]
    assert np.isnan(s["gt_disp"]).all()
    assert np.isnan(s["noc_mask"]).all()


def test_gen_manifests_sceneflow(sceneflow_root, tmp_path, monkeypatch):
    root, _ = sceneflow_root
    import importlib
    sys_path_mod = importlib.import_module("tools.gen_manifests") \
        if False else None
    del sys_path_mod
    # import the tool module directly
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "gen_manifests", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools", "gen_manifests.py"))
    gm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gm)
    rows = gm.scan_sceneflow(root, "test_finalpass")
    assert len(rows) == 3
    assert rows[0][2].endswith(".pfm")


# ---------------------------------------------------------------------------
# Vendored manifests: every dataset class constructs out of the box from the
# packaged lists (reference ships these as datasets_lists/**,
# datasets/utils.py:11-21). Root dirs need not exist at construction time.
# ---------------------------------------------------------------------------

VENDORED_CASES = [
    ("SceneFlow_Dataset", "test_finalpass", 4370),
    ("SceneFlow_Dataset", "test_cleanpass", 4370),
    ("KITTI2015_Dataset", "train", 184),
    ("KITTI2015_Dataset", "val", 16),
    ("KITTI2015_Dataset", "test", 200),
    ("KITTI2012_Dataset", "train", 176),
    ("MiddleburyEval3_Dataset", "trainH", 12),
    ("ETH3D_Dataset", "train", 22),
    ("DrivingStereo_Dataset", "test_half_sunny", 100),
    ("DrivingStereo_Dataset", "test_half", 7751),
    ("Middlebury2021_Dataset", "train", 24),
    ("Sintel_Dataset", "train_clean", 1064),
    ("HR_VS_Dataset", "train", 780),
    ("Booster_Dataset", "train_balanced", 228),
    ("InStereo2k_Dataset", "train", 2010),
    ("Argoverse_Dataset", "train", 4008),
    ("Holopix50k_Dataset", "train", 41742),
    ("MonoTrap_Dataset", "val", 26),
    ("VirtualKITTI2_Dataset", "train", 21260),
]


@pytest.mark.parametrize("cls_name,split,n", VENDORED_CASES)
def test_vendored_manifest_constructs(cls_name, split, n):
    from stereo_toolbox_tpu.datasets import zoo
    ds = getattr(zoo, cls_name)(split=split, training=False,
                                root_dir="/nonexistent/root")
    assert len(ds) == n


def test_gen_manifests_crestereo_fallingthings(tmp_path):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "gen_manifests", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools", "gen_manifests.py"))
    gm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gm)

    cre = tmp_path / "cre"
    for i in range(2):
        _write_png(str(cre / "hole" / f"{i}_left.jpg"), _rgb(64, 64, i))
        _write_png(str(cre / "hole" / f"{i}_right.jpg"), _rgb(64, 64, i))
        _write_png(str(cre / "hole" / f"{i}_left.disp.png"),
                   np.zeros((64, 64), np.uint8))
    assert len(gm.scan_crestereo(str(cre))) == 2

    fat = tmp_path / "fat"
    _write_png(str(fat / "a" / "000.left.jpg"), _rgb(64, 64, 0))
    _write_png(str(fat / "a" / "000.right.jpg"), _rgb(64, 64, 1))
    _write_png(str(fat / "a" / "000.left.depth.png"),
               np.zeros((64, 64), np.uint8))
    rows = gm.scan_fallingthings(str(fat))
    assert rows == [(os.path.join("a", "000.left.jpg"),
                     os.path.join("a", "000.right.jpg"),
                     os.path.join("a", "000.left.depth.png"))]
