"""ctypes binding to the C++ oracle (cpp/oracle.cc).

Builds ``libradx_oracle.so`` on demand with g++ (cached next to the source;
rebuilt when the source is newer).  pybind11 is not available in this image,
so the binding is a plain C ABI + ctypes, per the project constraints.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from radx_tpu.config import SortConfig

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "cpp", "oracle.cc")
_LIB = os.path.join(_REPO, "cpp", "libradx_oracle.so")
_lock = threading.Lock()
_lib = None


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    """Load (building if needed) the native oracle library."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.radx_oracle_sort_u32.argtypes = [
            u32p, u32p, ctypes.c_size_t, ctypes.c_uint32, ctypes.c_uint32]
        lib.radx_oracle_sort_pairs.argtypes = [
            u32p, u32p, u32p, u32p, ctypes.c_size_t, ctypes.c_uint32,
            ctypes.c_uint32]
        lib.radx_oracle_radix_pass.argtypes = [
            u32p, u32p, ctypes.c_size_t, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.c_uint32, i64p]
        _lib = lib
        return lib


def _u32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def sort_u32(keys: np.ndarray, cfg: SortConfig | None = None) -> np.ndarray:
    cfg = cfg or SortConfig()
    lib = load()
    keys = np.ascontiguousarray(keys, dtype=np.uint32)
    out = np.empty_like(keys)
    lib.radx_oracle_sort_u32(
        _u32p(keys), _u32p(out), keys.size, cfg.bits_per_pass, cfg.tile_elems)
    return out


def sort_pairs(keys: np.ndarray, payload: np.ndarray,
               cfg: SortConfig | None = None):
    cfg = cfg or SortConfig()
    lib = load()
    keys = np.ascontiguousarray(keys, dtype=np.uint32)
    payload = np.ascontiguousarray(payload, dtype=np.uint32)
    out_k = np.empty_like(keys)
    out_p = np.empty_like(payload)
    lib.radx_oracle_sort_pairs(
        _u32p(keys), _u32p(payload), _u32p(out_k), _u32p(out_p), keys.size,
        cfg.bits_per_pass, cfg.tile_elems)
    return out_k, out_p


def radix_pass(keys: np.ndarray, shift: int, cfg: SortConfig | None = None):
    """One pass; returns (keys_out, per-tile histogram) for phase parity tests."""
    cfg = cfg or SortConfig()
    lib = load()
    keys = np.ascontiguousarray(keys, dtype=np.uint32)
    out = np.empty_like(keys)
    ntiles = -(-keys.size // cfg.tile_elems)
    counts = np.empty((ntiles, cfg.radix), dtype=np.int64)
    lib.radx_oracle_radix_pass(
        _u32p(keys), _u32p(out), keys.size, shift, cfg.bits_per_pass,
        cfg.tile_elems, counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out, counts
