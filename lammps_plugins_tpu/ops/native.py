"""ctypes bindings for the native (C++) host runtime ops.

The shared library is built on first use with g++ -O3 (no pip deps; see the
environment constraints) and cached next to the source.  Every native op
has a pure-numpy fallback in neighbor/build.py, selected automatically if
compilation fails.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "neighbor_native.cpp")
_LIB = os.path.join(_HERE, "_neighbor_native.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
           "-pthread", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return True
    except Exception:
        return False


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB) or \
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.lpt_find_pairs.restype = ctypes.c_int64
        lib.lpt_find_pairs.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_double, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ]
        lib.lpt_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def find_pairs(x_own: np.ndarray, x_all: np.ndarray, rcut: float,
               nthreads: int = 0):
    """Native pair search; returns (pi, pj, rsq) or None if lib missing."""
    lib = get_lib()
    if lib is None:
        return None
    x_own = np.ascontiguousarray(x_own, dtype=np.float64)
    x_all = np.ascontiguousarray(x_all, dtype=np.float64)
    pi = ctypes.POINTER(ctypes.c_int32)()
    pj = ctypes.POINTER(ctypes.c_int32)()
    rsq = ctypes.POINTER(ctypes.c_double)()
    n = lib.lpt_find_pairs(
        x_own.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(x_own),
        x_all.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(x_all),
        float(rcut), int(nthreads),
        ctypes.byref(pi), ctypes.byref(pj), ctypes.byref(rsq))
    try:
        out_i = np.ctypeslib.as_array(pi, shape=(n,)).copy() if n else \
            np.zeros(0, np.int32)
        out_j = np.ctypeslib.as_array(pj, shape=(n,)).copy() if n else \
            np.zeros(0, np.int32)
        out_r = np.ctypeslib.as_array(rsq, shape=(n,)).copy() if n else \
            np.zeros(0)
    finally:
        lib.lpt_free(pi)
        lib.lpt_free(pj)
        lib.lpt_free(rsq)
    return out_i, out_j, out_r
