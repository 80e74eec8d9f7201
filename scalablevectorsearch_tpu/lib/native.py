"""ctypes bindings for the native runtime library.

The reference's runtime around the compute path is C++ (IO readers,
allocators, threadpools); this framework's device compute is JAX/XLA, and the
host-side runtime hot paths (bulk file ingest with fused padding) live in
``native/vecs_io.cpp``, built lazily with g++ on first use and loaded via
ctypes (no pybind11 in this environment).

Every entry point has a pure-NumPy fallback, so the framework works without
a compiler; the native path exists for large-scale ingest performance.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

from . import logging as svs_logging

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libsvs_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR],
                       check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, OSError) as e:
        svs_logging.get().debug("native build failed: %s", e)
        return False


def get_library() -> Optional[ctypes.CDLL]:
    """Load (building if necessary) the native library; None on failure."""
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            svs_logging.get().debug("native load failed: %s", e)
            _load_failed = True
            return None
        lib.probe_vecs.restype = ctypes.c_int
        lib.probe_vecs.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        lib.read_vecs_padded.restype = ctypes.c_int
        lib.read_vecs_padded.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
        lib.write_vecs.restype = ctypes.c_int
        lib.write_vecs.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int64]
        _lib = lib
        return _lib


def available() -> bool:
    return get_library() is not None


def probe_vecs(path: str, elt_size: int):
    """Return (n, dim) for a vecs file, or None if native is unavailable."""
    lib = get_library()
    if lib is None:
        return None
    n = ctypes.c_int64()
    dim = ctypes.c_int64()
    rc = lib.probe_vecs(path.encode(), elt_size, ctypes.byref(n),
                        ctypes.byref(dim))
    if rc != 0:
        raise ValueError(f"probe_vecs({path}) failed with code {rc}")
    return int(n.value), int(dim.value)


def read_vecs_padded(path: str, dtype, n_pad: int, d_pad: int,
                     max_rows: int = -1, n_threads: int = 8):
    """Read a vecs file straight into a padded (n_pad, d_pad) array, or
    return None if the native library is unavailable."""
    import numpy as np
    lib = get_library()
    if lib is None:
        return None
    dtype = np.dtype(dtype)
    out = np.empty((n_pad, d_pad), dtype=dtype)
    rc = lib.read_vecs_padded(
        path.encode(), dtype.itemsize,
        out.ctypes.data_as(ctypes.c_void_p),
        n_pad, d_pad * dtype.itemsize, max_rows, n_threads)
    if rc != 0:
        raise ValueError(f"read_vecs_padded({path}) failed with code {rc}")
    return out


def write_vecs(path: str, data) -> bool:
    """Native vecs writer; returns False if unavailable."""
    import numpy as np
    lib = get_library()
    if lib is None:
        return False
    data = np.ascontiguousarray(data)
    rc = lib.write_vecs(path.encode(),
                        data.ctypes.data_as(ctypes.c_void_p),
                        data.shape[0], data.shape[1], data.dtype.itemsize)
    if rc != 0:
        raise ValueError(f"write_vecs({path}) failed with code {rc}")
    return True
