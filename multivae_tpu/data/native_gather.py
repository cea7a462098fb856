"""ctypes bindings for the native threaded batch gather (native/gather.cpp).

Falls back to numpy fancy indexing when the shared library is unavailable
or cannot be built. The library is compiled on first use with g++ and cached
next to the source.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_LIB = None
_LIB_LOCK = threading.Lock()
_BUILD_FAILED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def _load_library():
    global _LIB, _BUILD_FAILED
    if _LIB is not None or _BUILD_FAILED:
        return _LIB
    with _LIB_LOCK:
        if _LIB is not None or _BUILD_FAILED:
            return _LIB
        src = os.path.join(_native_dir(), "gather.cpp")
        so = os.path.join(_native_dir(), "libgather.so")
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-pthread", "-o", so, src],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(so)
            lib.gather_rows.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int,
            ]
            _LIB = lib
        except Exception as e:  # pragma: no cover - toolchain dependent
            logger.info("native gather unavailable (%s); falling back to "
                        "numpy", e)
            _BUILD_FAILED = True
    return _LIB


def gather_rows(src: np.ndarray, indices: np.ndarray,
                n_threads: int = None) -> np.ndarray:
    """dst[i] = src[indices[i]] with a threaded native gather.

    src must be C-contiguous; any row shape.
    """
    lib = _load_library()
    if lib is None or not src.flags["C_CONTIGUOUS"]:
        return src[indices]
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    # The C library trusts indices; out-of-range would read arbitrary memory.
    # Negative indices are valid numpy semantics the native path lacks, so
    # both cases route to the (bounds-checked) numpy gather.
    if indices.size and (indices.min() < 0 or indices.max() >= len(src)):
        return src[indices]
    if n_threads is None:
        n_threads = min(8, os.cpu_count() or 1)
    out = np.empty((len(indices), *src.shape[1:]), dtype=src.dtype)
    row_bytes = src.dtype.itemsize * int(np.prod(src.shape[1:], initial=1))
    lib.gather_rows(
        src.ctypes.data_as(ctypes.c_char_p),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out.ctypes.data_as(ctypes.c_char_p),
        ctypes.c_int64(len(indices)), ctypes.c_int64(row_bytes),
        ctypes.c_int(n_threads),
    )
    return out


def native_available() -> bool:
    return _load_library() is not None
