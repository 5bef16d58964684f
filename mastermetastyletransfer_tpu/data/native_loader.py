"""ctypes bridge to the native C++ JPEG decode+resize loader.

Compiles mastermetastyletransfer_tpu/native/loader.cpp on first use (g++ is
in the image; pybind11 is not, hence the C ABI + ctypes). Falls back to the
PIL path per-file for non-JPEGs or decode failures, and entirely if the
toolchain/libjpeg is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libmmst_loader.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_SO_PATH):
            try:
                subprocess.run(
                    ["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                    check=True, capture_output=True, timeout=120)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.mmst_decode_resize_batch.restype = ctypes.c_int
        lib.mmst_decode_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load_library() is not None


def decode_resize_batch(paths: List[str], resize_to: int,
                        n_threads: int = 4) -> np.ndarray:
    """Decode+resize a batch of image files to uint8 (N, S, S, 3).

    JPEGs go through the native C++ path; failures / other formats fall back
    to PIL per file.
    """
    n = len(paths)
    out = np.empty((n, resize_to, resize_to, 3), np.uint8)
    lib = _load_library()
    ok = np.zeros((n,), np.uint8)
    if lib is not None:
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        lib.mmst_decode_resize_batch(
            arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            resize_to, n_threads, ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    for i in range(n):
        if not ok[i]:
            from mastermetastyletransfer_tpu.data.pipeline import _decode_resize
            out[i] = _decode_resize(paths[i], resize_to)
    return out
