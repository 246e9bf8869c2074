"""ctypes bindings for the native IO runtime (native/stereo_io.cpp).

The C++ library replaces the hot host-side path of the reference's data layer
(PIL decode in every dataset __getitem__ plus the torchvision normalize in
datasets/utils.py:62-69) with libpng/libjpeg decoders and a fused
uint8→ImageNet-normalized-float32 kernel. Because ctypes drops the GIL for
the duration of each foreign call, the thread-pool DataLoader gets genuinely
parallel decode — the torch `num_workers` subprocess machinery is unnecessary.

Import is always safe: if the shared library is absent we try a quick local
g++ build; if that fails too, `available` is False and callers fall back to
the pure-Python decoders in `datasets/io.py`. Set STEREO_TPU_NATIVE_IO=0 to
force the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libstereo_io.so")
_SRC = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "native",
                    "stereo_io.cpp")

_lib = None


def _try_build() -> bool:
    if not os.path.exists(_SRC):
        return False
    cmd = ["g++", "-O3", "-fPIC", "-shared", _SRC, "-lpng", "-ljpeg",
           "-o", _SO]
    try:
        return subprocess.run(cmd, capture_output=True,
                              timeout=120).returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False


def _load():
    global _lib
    if os.environ.get("STEREO_TPU_NATIVE_IO", "1") == "0":
        return None
    if not os.path.exists(_SO) and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    c_char_p, c_int, c_ll = ctypes.c_char_p, ctypes.c_int, ctypes.c_longlong
    intp = ctypes.POINTER(c_int)
    lib.sio_last_error.restype = c_char_p
    lib.sio_image_info.argtypes = [c_char_p, intp, intp, intp, intp]
    lib.sio_decode_pfm.argtypes = [c_char_p, ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_float)]
    lib.sio_decode_rgb8.argtypes = [c_char_p, ctypes.c_void_p]
    lib.sio_decode_raw.argtypes = [c_char_p, ctypes.c_void_p]
    lib.sio_normalize_imagenet.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                           c_ll]
    lib.sio_load_image_normalized.argtypes = [c_char_p, ctypes.c_void_p,
                                              ctypes.c_void_p]
    return lib


_lib = _load()
available = _lib is not None


class NativeIOError(RuntimeError):
    pass


def _check(rc: int):
    if rc != 0:
        raise NativeIOError(_lib.sio_last_error().decode("utf-8", "replace"))


def image_info(path: str) -> tuple[int, int, int, int]:
    """(width, height, channels, bitdepth) without decoding the raster."""
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    d = ctypes.c_int()
    _check(_lib.sio_image_info(path.encode(), ctypes.byref(w),
                               ctypes.byref(h), ctypes.byref(c),
                               ctypes.byref(d)))
    return w.value, h.value, c.value, d.value


def decode_pfm(path: str) -> tuple[np.ndarray, float]:
    """PFM → (top-down float32 HxW[x3], |scale|). Parity: pfm_imread."""
    w, h, c, _ = image_info(path)
    shape = (h, w, 3) if c == 3 else (h, w)
    out = np.empty(shape, np.float32)
    scale = ctypes.c_float()
    _check(_lib.sio_decode_pfm(path.encode(),
                               out.ctypes.data_as(ctypes.c_void_p),
                               ctypes.byref(scale)))
    return out, scale.value


def decode_rgb(path: str) -> np.ndarray:
    """PNG/JPEG → uint8 HxWx3 RGB (alpha dropped, palette/gray expanded)."""
    w, h, _, _ = image_info(path)
    out = np.empty((h, w, 3), np.uint8)
    _check(_lib.sio_decode_rgb8(path.encode(),
                                out.ctypes.data_as(ctypes.c_void_p)))
    return out


def decode_raw(path: str) -> np.ndarray:
    """PNG preserving stored bit depth: uint8/uint16, HxW[xC]."""
    w, h, c, depth = image_info(path)
    dtype = np.uint16 if depth == 16 else np.uint8
    shape = (h, w) if c == 1 else (h, w, c)
    out = np.empty(shape, dtype)
    _check(_lib.sio_decode_raw(path.encode(),
                               out.ctypes.data_as(ctypes.c_void_p)))
    return out


def imagenet_normalize_u8(img: np.ndarray) -> np.ndarray:
    """uint8 HxWx3 → float32 (x/255 - mean)/std, fused single pass."""
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim != 3 or img.shape[-1] != 3:
        raise ValueError(f"expected HxWx3 uint8, got {img.shape}")
    out = np.empty(img.shape, np.float32)
    _check(_lib.sio_normalize_imagenet(
        img.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_longlong(img.shape[0] * img.shape[1])))
    return out


def load_image_normalized(path: str) -> np.ndarray:
    """Decode PNG/JPEG and ImageNet-normalize in one native call."""
    w, h, _, _ = image_info(path)
    out = np.empty((h, w, 3), np.float32)
    scratch = np.empty((h, w, 3), np.uint8)
    _check(_lib.sio_load_image_normalized(
        path.encode(), out.ctypes.data_as(ctypes.c_void_p),
        scratch.ctypes.data_as(ctypes.c_void_p)))
    return out
