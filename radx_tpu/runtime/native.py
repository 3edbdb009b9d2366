"""ctypes binding to cpp/runtime.cc (built on demand with g++).

Multi-threaded generation/validation at memory speed so 256M-1B-row bench
configs aren't bottlenecked on NumPy; mirrors how the reference's C++
harness owns workload generation (src/test/sort.cpp:310-350).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "cpp", "runtime.cc")
_LIB = os.path.join(_REPO, "cpp", "libradx_runtime.so")
_lock = threading.Lock()
_lib = None


def load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                 "-fPIC", "-pthread", _SRC, "-o", _LIB],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.radx_rt_gen_uniform.argtypes = [u32p, ctypes.c_size_t, ctypes.c_uint64]
        lib.radx_rt_gen_permutation.argtypes = [u32p, ctypes.c_size_t, ctypes.c_uint64]
        lib.radx_rt_gen_skewed.argtypes = [
            u32p, ctypes.c_size_t, ctypes.c_uint64,
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_double,
        ]
        lib.radx_rt_validate_sort.argtypes = [u32p, u32p, ctypes.c_size_t]
        lib.radx_rt_validate_sort.restype = ctypes.c_int
        _lib = lib
        return lib


def _p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def gen_uniform(n: int, seed: int = 0) -> np.ndarray:
    out = np.empty(n, np.uint32)
    load().radx_rt_gen_uniform(_p(out), n, seed)
    return out


def gen_permutation(n: int, seed: int = 0) -> np.ndarray:
    """Shuffled 0..n-1 — the reference harness fixture (sort.cpp:348-350)."""
    out = np.empty(n, np.uint32)
    load().radx_rt_gen_permutation(_p(out), n, seed)
    return out


def gen_skewed(
    n: int,
    seed: int = 0,
    hot_lo: int = 0x12340000,
    hot_hi: int = 0x1234FFFF,
    hot_frac: float = 0.8,
) -> np.ndarray:
    out = np.empty(n, np.uint32)
    load().radx_rt_gen_skewed(_p(out), n, seed, hot_lo, hot_hi, hot_frac)
    return out


def validate_sort(orig: np.ndarray, sorted_arr: np.ndarray) -> int:
    """0 = ok; 1 = not ascending; 2 = multiset mismatch (checksum-based;
    the bit-exact test gate is oracle comparison)."""
    orig = np.ascontiguousarray(orig, np.uint32)
    sorted_arr = np.ascontiguousarray(sorted_arr, np.uint32)
    if orig.shape != sorted_arr.shape:
        return 2
    return load().radx_rt_validate_sort(_p(orig), _p(sorted_arr), orig.size)
