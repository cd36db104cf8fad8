"""ctypes bindings for the native data-IO library (native/dataio.cpp).

Auto-builds ``native/libdataio.so`` with make on first use if the toolchain
is available; callers fall back to cv2/PIL when neither the library nor a
compiler is present.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdataio.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"], check=True, capture_output=True
            )
        except Exception as e:  # pragma: no cover
            logger.info("native dataio build unavailable (%s); using fallbacks", e)
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:  # pragma: no cover
        logger.info("native dataio load failed (%s)", e)
        return None
    lib.png_info.restype = ctypes.c_int
    lib.png_info.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.png_decode.restype = ctypes.c_int
    lib.png_decode.argtypes = [ctypes.c_char_p, ctypes.c_long, ctypes.c_void_p]
    lib.resize_bilinear_u8.restype = None
    lib.resize_bilinear_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def decode_png(path: str) -> Optional[np.ndarray]:
    """PNG file -> (h, w, c) uint8, or None if unsupported/native missing."""
    lib = _load()
    if lib is None:
        return None
    with open(path, "rb") as f:
        raw = f.read()
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.png_info(raw, len(raw), ctypes.byref(w), ctypes.byref(h), ctypes.byref(c))
    if rc != 0:
        return None
    out = np.empty((h.value, w.value, c.value), dtype=np.uint8)
    rc = lib.png_decode(raw, len(raw), out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        logger.warning("native png_decode failed rc=%d for %s", rc, path)
        return None
    return out


def resize_bilinear(img: np.ndarray, size: Tuple[int, int]) -> Optional[np.ndarray]:
    """img (h, w, c) uint8 -> (size[1], size[0], c) (size is (w, h), cv2 order)."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img)
    ow, oh = size
    ih, iw, c = img.shape
    out = np.empty((oh, ow, c), dtype=np.uint8)
    lib.resize_bilinear_u8(
        img.ctypes.data_as(ctypes.c_void_p), ih, iw, c,
        out.ctypes.data_as(ctypes.c_void_p), oh, ow,
    )
    return out
