"""ctypes bindings for the native host-side image pipeline (native/src/image_io.cc).

The reference relies on native decode (jpeg4py → libjpeg-turbo, install.sh:37); here
the native library provides JPEG decode and the bilinear crop+resize hot path of the
training pipeline. Falls back to PIL/numpy transparently when the shared library is not
built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "build",
                 "libptt_image_io.so"),
    os.environ.get("PYTRACKING_TPU_NATIVE_LIB", ""),
]

_lib = None
for _p in _LIB_PATHS:
    if _p and os.path.isfile(_p):
        try:
            _lib = ctypes.CDLL(os.path.abspath(_p))
            break
        except OSError:
            continue

if _lib is not None:
    _lib.ptt_decode_jpeg_info.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    _lib.ptt_decode_jpeg_info.restype = ctypes.c_int
    _lib.ptt_decode_jpeg.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int]
    _lib.ptt_decode_jpeg.restype = ctypes.c_int
    _lib.ptt_crop_resize.argtypes = [
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int]
    _lib.ptt_crop_resize.restype = None


def native_available() -> bool:
    return _lib is not None


def decode_jpeg(path: str) -> np.ndarray:
    """Decode a JPEG file to an RGB uint8 array; native fast path, PIL fallback."""
    if _lib is not None:
        with open(path, "rb") as f:
            data = f.read()
        w = ctypes.c_int()
        h = ctypes.c_int()
        c = ctypes.c_int()
        if _lib.ptt_decode_jpeg_info(data, len(data), ctypes.byref(w),
                                     ctypes.byref(h), ctypes.byref(c)) == 0:
            out = np.empty((h.value, w.value, 3), np.uint8)
            if _lib.ptt_decode_jpeg(data, len(data), out, h.value, w.value) == 0:
                return out
    from PIL import Image
    return np.asarray(Image.open(path).convert("RGB"))


def crop_resize(src: np.ndarray, y0: float, x0: float, crop_h: float, crop_w: float,
                out_hw: Tuple[int, int]) -> np.ndarray:
    """Bilinear crop+resize with replicate borders; same coordinate convention as
    ops/patch.sample_patch. src (H, W, C) uint8 -> (out_h, out_w, C) uint8."""
    src = np.ascontiguousarray(src, np.uint8)
    out_h, out_w = out_hw
    if _lib is not None and src.ndim == 3:
        dst = np.empty((out_h, out_w, src.shape[2]), np.uint8)
        _lib.ptt_crop_resize(src, src.shape[0], src.shape[1], src.shape[2],
                             float(y0), float(x0), float(crop_h), float(crop_w),
                             dst, out_h, out_w)
        return dst
    # numpy fallback (vectorized bilinear)
    ys = y0 + (np.arange(out_h) + 0.5) / out_h * crop_h - 0.5
    xs = x0 + (np.arange(out_w) + 0.5) / out_w * crop_w - 0.5
    y0i = np.clip(np.floor(ys).astype(int), 0, src.shape[0] - 1)
    y1i = np.clip(y0i + 1, 0, src.shape[0] - 1)
    x0i = np.clip(np.floor(xs).astype(int), 0, src.shape[1] - 1)
    x1i = np.clip(x0i + 1, 0, src.shape[1] - 1)
    fy = np.clip(ys - np.floor(ys), 0, 1)[:, None, None]
    fx = np.clip(xs - np.floor(xs), 0, 1)[None, :, None]
    a = src[y0i][:, x0i].astype(np.float32)
    b = src[y0i][:, x1i].astype(np.float32)
    c = src[y1i][:, x0i].astype(np.float32)
    d = src[y1i][:, x1i].astype(np.float32)
    out = (1 - fy) * ((1 - fx) * a + fx * b) + fy * ((1 - fx) * c + fx * d)
    return (out + 0.5).astype(np.uint8)
