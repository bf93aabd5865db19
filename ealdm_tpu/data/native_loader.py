"""ctypes binding for the native C++ batch image loader (native/loader.cpp).

Builds libealdm_loader.so on first use (g++, no pybind11); falls back to the
pure-Python loader when the toolchain is unavailable. Used by
StreamCameraDataset for the hot .npy decode+resize+normalize loop.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libealdm_loader.so"))

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _lib_failed = True
            return None
        lib.ealdm_probe_npy.restype = ctypes.c_int
        lib.ealdm_probe_npy.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.ealdm_load_image_f32.restype = ctypes.c_int
        lib.ealdm_load_image_f32.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.ealdm_load_batch_f32.restype = ctypes.c_int
        lib.ealdm_load_batch_f32.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def load_image(path: str, size: int) -> Optional[np.ndarray]:
    """One .npy image -> [size, size, 3] float32 in [-1, 1]; None on failure."""
    lib = get_lib()
    if lib is None or not path.endswith(".npy"):
        return None
    out = np.empty((size, size, 3), np.float32)
    rc = lib.ealdm_load_image_f32(
        path.encode(), size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    )
    return out if rc == 0 else None


def load_batch(paths: Sequence[str], size: int, threads: int = 0) -> Optional[np.ndarray]:
    """Batch of .npy images -> [N, size, size, 3] float32; None on any failure."""
    lib = get_lib()
    if lib is None or not all(p.endswith(".npy") for p in paths):
        return None
    n = len(paths)
    out = np.empty((n, size, size, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    threads = threads or min(os.cpu_count() or 1, 8)
    rc = lib.ealdm_load_batch_f32(
        arr, n, size, threads, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    )
    return out if rc == 0 else None
