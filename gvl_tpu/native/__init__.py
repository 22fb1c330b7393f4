"""ctypes bindings for the native (C++) feature loader, with auto-build and
a pure-python fallback. See feature_loader.cpp."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libgvl_native.so")
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_DIR, "feature_loader.cpp")
    cmd = ["g++", "-O3", "-shared", "-fPIC", src, "-o", _SO, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.gvl_load_resize.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32)]
    lib.gvl_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.c_float, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32)]
    _lib = lib
    return lib


def native_available() -> bool:
    return get_lib() is not None


def load_resize_native(path: str, target_t: int, dim: int,
                       method: str = "nearest", data_norm: bool = False,
                       mean: float = 0.0, var: float = 1.0
                       ) -> Optional[Tuple[np.ndarray, bool]]:
    """Load one .npy feature file + temporal rescale in C++.
    Returns (array (target_t, dim) f32, ok) or None if native lib missing."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((target_t, dim), np.float32)
    status = np.zeros((1,), np.int32)
    lib.gvl_load_resize(
        path.encode(), target_t, dim, 0 if method == "nearest" else 1,
        int(data_norm), float(mean), float(var),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out, bool(status[0])


def load_batch_native(paths: List[str], target_t: int, dim: int,
                      method: str = "nearest", data_norm: bool = False,
                      mean: float = 0.0, var: float = 1.0
                      ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Threaded batch load (n, target_t, dim); returns (feats, ok_mask)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, target_t, dim), np.float32)
    status = np.zeros((n,), np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.gvl_load_batch(
        arr, n, target_t, dim, 0 if method == "nearest" else 1,
        int(data_norm), float(mean), float(var),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out, status.astype(bool)
