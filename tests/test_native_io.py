"""Native C++ IO runtime (native/stereo_io.cpp) vs pure-Python parity.

The native path must be bit-identical to the PIL/NumPy fallback for every
decoder the data layer uses (SURVEY.md §2.2 decode rules).
"""

import os

import numpy as np
import pytest
from PIL import Image

from stereo_toolbox_tpu import native as nio
from stereo_toolbox_tpu.datasets import io

pytestmark = pytest.mark.skipif(
    not nio.available, reason="native IO library not built")


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(42)


def test_decode_rgb8_png(tmp_path, rng):
    img = rng.randint(0, 256, (37, 53, 3), np.uint8)
    p = str(tmp_path / "rgb.png")
    Image.fromarray(img).save(p)
    assert np.array_equal(nio.decode_rgb(p), img)


def test_decode_rgb8_gray_png_expands(tmp_path, rng):
    g = rng.randint(0, 256, (21, 17), np.uint8)
    p = str(tmp_path / "g.png")
    Image.fromarray(g).save(p)
    ref = np.asarray(Image.open(p).convert("RGB"))
    assert np.array_equal(nio.decode_rgb(p), ref)


def test_decode_rgb8_rgba_drops_alpha(tmp_path, rng):
    img = rng.randint(0, 256, (19, 23, 4), np.uint8)
    p = str(tmp_path / "rgba.png")
    Image.fromarray(img, "RGBA").save(p)
    assert np.array_equal(nio.decode_rgb(p), img[..., :3])


def test_decode_rgb8_jpeg_matches_pil(tmp_path, rng):
    img = rng.randint(0, 256, (48, 64, 3), np.uint8)
    p = str(tmp_path / "img.jpg")
    Image.fromarray(img).save(p, quality=92)
    ref = np.asarray(Image.open(p).convert("RGB"))
    # Both decode through the same libjpeg → bit-identical.
    assert np.array_equal(nio.decode_rgb(p), ref)


def test_decode_raw_uint16(tmp_path, rng):
    d16 = rng.randint(0, 65536, (31, 29), np.uint16)
    p = str(tmp_path / "d16.png")
    Image.fromarray(d16).save(p)
    out = nio.decode_raw(p)
    assert out.dtype == np.uint16
    assert np.array_equal(out, d16)


def test_decode_raw_uint8(tmp_path, rng):
    g8 = rng.randint(0, 256, (31, 29), np.uint8)
    p = str(tmp_path / "g8.png")
    Image.fromarray(g8).save(p)
    out = nio.decode_raw(p)
    assert out.dtype == np.uint8
    assert np.array_equal(out, g8)


def _write_pfm(path, data, scale):
    with open(path, "wb") as f:
        f.write(b"PF\n" if data.ndim == 3 else b"Pf\n")
        f.write(f"{data.shape[1]} {data.shape[0]}\n{scale}\n".encode())
        f.write(np.flipud(data).astype(
            "<f4" if scale < 0 else ">f4").tobytes())


@pytest.mark.parametrize("scale", [-1.0, 2.5])
@pytest.mark.parametrize("color", [False, True])
def test_decode_pfm_endianness(tmp_path, rng, scale, color):
    shape = (13, 17, 3) if color else (13, 17)
    arr = rng.randn(*shape).astype(np.float32)
    p = str(tmp_path / "t.pfm")
    _write_pfm(p, arr, scale)
    out, sc = nio.decode_pfm(p)
    assert sc == abs(scale)
    assert np.array_equal(out, arr)
    # and identical to the pure-Python reader
    os.environ["STEREO_TPU_NATIVE_IO"] = "1"
    ref, rsc = io.pfm_imread(p)
    assert np.array_equal(out, ref) and sc == rsc


def test_normalize_fused_matches_numpy(rng):
    img = rng.randint(0, 256, (65, 77, 3), np.uint8)
    ref = io.imagenet_normalize(io.to_float01(img))
    got = nio.imagenet_normalize_u8(img)
    np.testing.assert_allclose(got, ref, atol=2e-6)
    # the dispatching helper picks the same path
    np.testing.assert_allclose(io.normalize_u8(img), ref, atol=2e-6)


def test_load_image_normalized_fused(tmp_path, rng):
    img = rng.randint(0, 256, (40, 56, 3), np.uint8)
    p = str(tmp_path / "x.png")
    Image.fromarray(img).save(p)
    ref = io.imagenet_normalize(io.to_float01(img))
    np.testing.assert_allclose(nio.load_image_normalized(p), ref, atol=2e-6)


def test_image_info(tmp_path, rng):
    img = rng.randint(0, 65536, (12, 34), np.uint16)
    p = str(tmp_path / "i.png")
    Image.fromarray(img).save(p)
    w, h, c, depth = nio.image_info(p)
    assert (w, h, c, depth) == (34, 12, 1, 16)


def test_error_reporting(tmp_path):
    p = str(tmp_path / "nope.png")
    with pytest.raises(nio.NativeIOError):
        nio.decode_rgb(p)
    with open(p, "wb") as f:
        f.write(b"garbage here")
    with pytest.raises(nio.NativeIOError):
        nio.decode_raw(p)


def test_io_dispatch_matches_pil(tmp_path, rng):
    """The datasets.io front-ends give identical results with the native
    path on vs off."""
    img = rng.randint(0, 256, (24, 36, 3), np.uint8)
    d16 = rng.randint(0, 30000, (24, 36), np.uint16)
    pi = str(tmp_path / "img.png")
    pd = str(tmp_path / "d.png")
    Image.fromarray(img).save(pi)
    Image.fromarray(d16).save(pd)
    assert np.array_equal(io.load_image_rgb(pi),
                          np.asarray(Image.open(pi).convert("RGB")))
    np.testing.assert_array_equal(
        io.disp_from_png_scaled(pd, 256.0),
        np.asarray(Image.open(pd)).astype(np.float32) / 256.0)
