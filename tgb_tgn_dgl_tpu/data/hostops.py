"""ctypes bindings for the native host-side preprocessing library.

The reference relies on an external Cython/C++ TGL sampler
(reference README.md:1-2) for its host-side hot loops; our equivalent is
csrc/hostops.cpp compiled to ``libhostops.so``.  Python falls back to the
numpy implementations transparently when the library has not been built
(``python -m tgb_tgn_dgl_tpu.data.build_hostops`` builds it).
"""
from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional

import numpy as np

_LIB = None
_LIB_LOCK = threading.Lock()
_SEARCHED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "csrc", "libhostops.so")


def _load():
    global _LIB, _SEARCHED
    with _LIB_LOCK:
        if _SEARCHED:
            return _LIB
        _SEARCHED = True
        path = os.path.abspath(_lib_path())
        if not os.path.exists(path):
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")

        lib.dependency_blocks.argtypes = [
            i32p, i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            i32p,
        ]
        lib.dependency_blocks.restype = None

        lib.build_tcsr.argtypes = [
            i32p, i32p, f32p, ctypes.c_int64, ctypes.c_int64,
            i64p, i32p, i32p, f32p,
        ]
        lib.build_tcsr.restype = None

        lib.sample_recent.argtypes = [
            i64p, i32p, i32p, f32p,          # t-CSR (indptr, indices, eid, ts)
            i32p, f32p, ctypes.c_int64,      # query nodes, query times, count
            ctypes.c_int32, ctypes.c_int32,  # K, num_threads
            i32p, i32p, f32p,                # out: nbr, eid, ts
        ]
        lib.sample_recent.restype = None

        lib.sample_uniform.argtypes = [
            i64p, i32p, i32p, f32p,
            i32p, f32p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_uint64, ctypes.c_int32,
            i32p, i32p, f32p,
        ]
        lib.sample_uniform.restype = None

        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def dependency_blocks(src: np.ndarray, dst: np.ndarray, batch_size: int,
                      num_threads: Optional[int] = None) -> np.ndarray:
    lib = _load()
    assert lib is not None
    n = len(src)
    out = np.empty(n, dtype=np.int32)
    nt = num_threads or min(32, os.cpu_count() or 1)
    lib.dependency_blocks(src, dst, n, batch_size, nt, out)
    return out


def build_tcsr(src, dst, t, num_nodes):
    """Undirected t-CSR (indptr/indices/eid/ts), TGL ext_full.npz layout
    (consumed at reference utils.py:73)."""
    lib = _load()
    assert lib is not None
    E = len(src)
    indptr = np.zeros(num_nodes + 1, dtype=np.int64)
    indices = np.empty(2 * E, dtype=np.int32)
    eid = np.empty(2 * E, dtype=np.int32)
    ts = np.empty(2 * E, dtype=np.float32)
    lib.build_tcsr(src, dst, t, E, num_nodes, indptr, indices, eid, ts)
    return indptr, indices, eid, ts


def sample_recent(indptr, indices, eid, ts, nodes, times, k, num_threads=None):
    lib = _load()
    assert lib is not None
    n = len(nodes)
    nbr = np.empty((n, k), dtype=np.int32)
    out_eid = np.empty((n, k), dtype=np.int32)
    out_ts = np.empty((n, k), dtype=np.float32)
    nt = num_threads or min(32, os.cpu_count() or 1)
    lib.sample_recent(indptr, indices, eid, ts, nodes, times, n, k, nt,
                      nbr, out_eid, out_ts)
    return nbr, out_eid, out_ts


def sample_uniform(indptr, indices, eid, ts, nodes, times, k, seed=0,
                   num_threads=None):
    lib = _load()
    assert lib is not None
    n = len(nodes)
    nbr = np.empty((n, k), dtype=np.int32)
    out_eid = np.empty((n, k), dtype=np.int32)
    out_ts = np.empty((n, k), dtype=np.float32)
    nt = num_threads or min(32, os.cpu_count() or 1)
    lib.sample_uniform(indptr, indices, eid, ts, nodes, times, n, k,
                       seed, nt, nbr, out_eid, out_ts)
    return nbr, out_eid, out_ts
