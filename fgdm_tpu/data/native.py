"""ctypes bindings for the native (C++) data transforms.

Loads ``native/libfgdm_transforms.so`` (built by ``native/build.sh``) and
exposes numpy-in/numpy-out wrappers.  Every function has a pure-numpy
fallback (from `fgdm_tpu.data.colorize`) so the framework works without the
compiled library; ``HAS_NATIVE`` reports availability.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cand = os.path.join(here, "native", "libfgdm_transforms.so")
    return cand if os.path.exists(cand) else None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.fgdm_colorize_u8.argtypes = [u8p, ctypes.c_int64, u8p,
                                     ctypes.c_int32, u8p]
    lib.fgdm_decolorize_u8.argtypes = [u8p, ctypes.c_int64, u8p,
                                       ctypes.c_int32, i32p]
    lib.fgdm_resize_bilinear_u8.argtypes = [u8p] + [ctypes.c_int32] * 5 + [u8p]
    lib.fgdm_resize_nearest_u8.argtypes = [u8p] + [ctypes.c_int32] * 5 + [u8p]
    lib.fgdm_normalize_f32.argtypes = [u8p, ctypes.c_int64, f32p]
    lib.fgdm_label_to_tensor.argtypes = [
        u8p, ctypes.c_int32, ctypes.c_int32, u8p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, f32p,
    ]
    _LIB = lib
    return lib


HAS_NATIVE = _load() is not None


def _u8(a):
    return np.ascontiguousarray(a, np.uint8)


def colorize(labels: np.ndarray, cmap: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None:
        from fgdm_tpu.data.colorize import colorize as np_colorize

        return np_colorize(labels, cmap)
    labels = _u8(labels)
    cmap = _u8(cmap)
    out = np.empty(labels.shape + (3,), np.uint8)
    lib.fgdm_colorize_u8(
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        labels.size, cmap.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(cmap), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def decolorize(rgb: np.ndarray, cmap: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None:
        from fgdm_tpu.data.colorize import decolorize as np_decolorize

        return np_decolorize(rgb, cmap)
    rgb = _u8(rgb)
    cmap = _u8(cmap)
    out = np.empty(rgb.shape[:-1], np.int32)
    lib.fgdm_decolorize_u8(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.size, cmap.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(cmap), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def resize_u8(img: np.ndarray, out_hw, method: str = "bilinear") -> np.ndarray:
    lib = _load()
    img = _u8(img)
    h, w = img.shape[:2]
    c = img.shape[2] if img.ndim == 3 else 1
    oh, ow = out_hw
    if lib is None:
        from PIL import Image

        rs = Image.fromarray(img.squeeze()).resize(
            (ow, oh),
            Image.BILINEAR if method == "bilinear" else Image.NEAREST)
        return np.asarray(rs).reshape(oh, ow, c)
    out = np.empty((oh, ow, c), np.uint8)
    fn = (lib.fgdm_resize_bilinear_u8 if method == "bilinear"
          else lib.fgdm_resize_nearest_u8)
    fn(img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c, oh, ow,
       out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def normalize_f32(img_u8: np.ndarray) -> np.ndarray:
    lib = _load()
    img_u8 = _u8(img_u8)
    if lib is None:
        return img_u8.astype(np.float32) / 127.5 - 1.0
    out = np.empty(img_u8.shape, np.float32)
    lib.fgdm_normalize_f32(
        img_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img_u8.size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def label_to_tensor(labels: np.ndarray, cmap: np.ndarray,
                    out_hw) -> np.ndarray:
    """Fused colorize→resize→normalize (the per-sample hot path)."""
    lib = _load()
    if lib is None:
        rgb = colorize(labels, cmap)
        rs = resize_u8(rgb, out_hw, "nearest")
        return normalize_f32(rs)
    labels = _u8(labels)
    cmap = _u8(cmap)
    oh, ow = out_hw
    out = np.empty((oh, ow, 3), np.float32)
    lib.fgdm_label_to_tensor(
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        labels.shape[0], labels.shape[1],
        cmap.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(cmap),
        oh, ow, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
