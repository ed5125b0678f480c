"""ctypes binding + on-demand build for the native xvecs reader.

The shared library builds lazily with the same recipe as the
reference's `deps/build.jl:17-49` (g++ -O3 -shared -fPIC -fopenmp) into
``rayuela_tpu/io/native/``. Every entry point degrades gracefully: if
the toolchain or the build is unavailable, callers fall back to the
pure-numpy readers in `rayuela_tpu.io.xvecs`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SRC = os.path.join(_DIR, "xvecs_native.cpp")
_LIB = os.path.join(_DIR, "libxvecs_native.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_failed = False

_ERRORS = {
    -1: OSError, -2: OSError, -3: ValueError, -4: ValueError,
    -5: ValueError,
}
_MSG = {
    -1: "open/stat failed", -2: "mmap failed",
    -3: "file size not a multiple of the row size",
    -4: "requested range out of bounds",
    -5: "inconsistent dimension headers",
}


def _build() -> str | None:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-fopenmp", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120)
        return _LIB
    except Exception:
        return None


def get_lib() -> ctypes.CDLL | None:
    """Load (building if needed) the native library, or None."""
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        path = _LIB if os.path.exists(_LIB) else _build()
        if path is None:
            _failed = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            _failed = True
            return None
        lib.xvecs_probe.restype = ctypes.c_int
        lib.xvecs_probe.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        lib.xvecs_read.restype = ctypes.c_int
        lib.xvecs_read.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p]
        lib.xvecs_write.restype = ctypes.c_int
        lib.xvecs_write.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _check(code: int, path: str) -> None:
    if code != 0:
        raise _ERRORS.get(code, OSError)(
            f"{path}: {_MSG.get(code, f'native error {code}')}")


def probe(path: str, value_size: int) -> tuple[int, int]:
    """(dim, n) of an xvecs file via the native prober."""
    lib = get_lib()
    assert lib is not None
    dim = ctypes.c_int64()
    n = ctypes.c_int64()
    _check(lib.xvecs_probe(path.encode(), value_size,
                           ctypes.byref(dim), ctypes.byref(n)), path)
    return int(dim.value), int(n.value)


def read(path: str, value_dtype, value_size: int, start: int = 0,
         count: int | None = None) -> np.ndarray:
    """Parallel mmap read → (count, dim) array (native path)."""
    lib = get_lib()
    assert lib is not None
    dim, n = probe(path, value_size)
    if count is None:
        count = n - start
    if start < 0 or count < 0 or start + count > n:
        raise ValueError(f"range [{start}, {start + count}) outside "
                         f"file with n={n}")
    out = np.empty((count, dim), dtype=value_dtype)
    _check(lib.xvecs_read(path.encode(), value_size, start, count,
                          out.ctypes.data_as(ctypes.c_void_p)), path)
    return out


def write(path: str, X: np.ndarray, value_dtype) -> None:
    lib = get_lib()
    assert lib is not None
    X = np.ascontiguousarray(X, dtype=value_dtype)
    n, dim = X.shape
    _check(lib.xvecs_write(path.encode(), X.dtype.itemsize, n, dim,
                           X.ctypes.data_as(ctypes.c_void_p)), path)
