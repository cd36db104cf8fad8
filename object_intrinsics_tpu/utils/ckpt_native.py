"""ctypes bindings for the native checkpoint pack (native/ckptpack.cpp).

Format ``.oipk``: "OIPK1\\n" | u64 header_len | JSON index | 64-aligned raw
tensor payload. Saves stream each tensor through C ``write()`` calls into a
tmp file (fsync+rename atomic, no Python-side payload assembly); loads mmap
the file and hand out
zero-copy numpy views. Used by utils/checkpoint.py when
``OI_CKPT_FORMAT=oipk``; the portable .npz path is the default.

The reference's equivalent is torch.save/torch.load (C++ pickling,
src/utils/checkpoint.py:36-48).
"""
from __future__ import annotations

import ctypes
import json
import logging
import os
import subprocess
from typing import Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libckptpack.so")
_ALIGN = 64
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True, capture_output=True)
        except Exception as e:  # pragma: no cover
            logger.info("native ckptpack build unavailable (%s)", e)
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:  # pragma: no cover
        logger.info("native ckptpack load failed (%s)", e)
        return None
    u64 = ctypes.c_uint64
    lib.ckptpack_write.restype = ctypes.c_int
    lib.ckptpack_write.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, u64,
        ctypes.c_int, ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(u64),
    ]
    lib.ckptpack_map.restype = ctypes.c_int
    lib.ckptpack_map.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(u64), ctypes.POINTER(u64), ctypes.POINTER(u64), ctypes.POINTER(u64),
    ]
    lib.ckptpack_unmap.restype = None
    lib.ckptpack_unmap.argtypes = [ctypes.c_void_p, u64]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def write_pack(path: str, flat: Dict[str, np.ndarray], meta: Optional[dict] = None) -> None:
    """flat: {dotted-key: ndarray}. One native write pass, atomic."""
    lib = _load()
    assert lib is not None, "native ckptpack unavailable"
    arrays = {k: np.ascontiguousarray(v) for k, v in flat.items()}
    index = {}
    off = 0
    for k, a in arrays.items():
        off = (off + _ALIGN - 1) // _ALIGN * _ALIGN
        index[k] = {"dtype": a.dtype.str, "shape": list(a.shape), "offset": off,
                    "nbytes": int(a.nbytes)}
        off += a.nbytes
    header = json.dumps({"tensors": index, "meta": meta or {}}, default=str).encode()
    # pad the header so the payload base (magic 6 + u64 8 + header) is
    # 64-aligned — tensor offsets are then aligned absolutely, and mmap'd
    # views land on cache-line boundaries
    pre = 6 + 8
    pad = (-(pre + len(header))) % _ALIGN
    header += b" " * pad

    n = len(arrays)
    ptrs = (ctypes.c_void_p * n)(
        *[a.ctypes.data_as(ctypes.c_void_p).value for a in arrays.values()]
    )
    sizes = (ctypes.c_uint64 * n)(*[a.nbytes for a in arrays.values()])
    rc = lib.ckptpack_write(path.encode(), header, len(header), n, ptrs, sizes)
    if rc != 0:
        raise IOError(f"ckptpack_write({path}) failed with code {rc}")


def read_pack(path: str, copy: bool = True) -> Tuple[Dict[str, np.ndarray], dict]:
    """Returns ({key: ndarray}, meta). ``copy=False`` hands out read-only
    zero-copy views into the mmap; the mapping handle is returned as
    ``meta['_mapping']`` and must outlive the views."""
    lib = _load()
    assert lib is not None, "native ckptpack unavailable"
    base = ctypes.c_void_p()
    map_len = ctypes.c_uint64()
    h_off = ctypes.c_uint64()
    h_len = ctypes.c_uint64()
    p_off = ctypes.c_uint64()
    rc = lib.ckptpack_map(path.encode(), ctypes.byref(base), ctypes.byref(map_len),
                          ctypes.byref(h_off), ctypes.byref(h_len), ctypes.byref(p_off))
    if rc != 0:
        raise IOError(f"ckptpack_map({path}) failed with code {rc}")

    class _Mapping:
        def __init__(self, addr, length):
            self.addr, self.length = addr, length

        def __del__(self):
            try:
                _load().ckptpack_unmap(self.addr, self.length)
            except Exception:  # pragma: no cover
                pass

    keep = _Mapping(base.value, map_len.value)
    raw = (ctypes.c_char * map_len.value).from_address(base.value)
    header = json.loads(bytes(raw[h_off.value : h_off.value + h_len.value]))

    out = {}
    whole = np.frombuffer(raw, dtype=np.uint8)
    for k, info in header["tensors"].items():
        start = p_off.value + info["offset"]
        view = whole[start : start + info["nbytes"]].view(np.dtype(info["dtype"]))
        view = view.reshape(info["shape"])
        if copy:
            out[k] = view.copy()
        else:
            view.flags.writeable = False
            out[k] = view
    meta = dict(header.get("meta", {}))
    if copy:
        del whole, raw, keep  # unmap immediately
    else:
        meta["_mapping"] = keep  # views borrow the mmap; keep it alive
    return out, meta
