"""Native (C++) helpers, built on demand and loaded via ctypes.

The only native hot spot this framework has is host-side batch assembly
from the packed crop cache (the reference's equivalents are all Python —
SURVEY.md §2.9 — so this is an addition, not a port). Everything degrades
gracefully to numpy when no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "batch_gather.cpp")


def _build() -> str | None:
    out = os.path.join(tempfile.gettempdir(), "simhand_batch_gather.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(_SRC):
        return out
    for flags in (["-fopenmp"], []):
        cmd = ["g++", "-O3", "-shared", "-fPIC", *flags, _SRC, "-o", out]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return out
        except Exception:
            continue
    return None


def _lib():
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        path = _build()
        if path:
            lib = ctypes.CDLL(path)
            lib.gather_records.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p,
            ]
            lib.gather_records_sharded.argtypes = [
                ctypes.POINTER(ctypes.c_void_p), ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p,
            ]
            _LIB = lib
    return _LIB


def gather_records(src: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """dst[i] = src[indices[i]] over the leading axis, multithreaded.

    src must be C-contiguous; falls back to numpy fancy indexing if the
    native library is unavailable.
    """
    lib = _lib()
    idx = np.ascontiguousarray(indices, np.int64)
    if lib is None or not src.flags["C_CONTIGUOUS"]:
        return src[idx]
    record_size = int(np.prod(src.shape[1:])) * src.dtype.itemsize
    dst = np.empty((len(idx),) + src.shape[1:], src.dtype)
    lib.gather_records(
        src.ctypes.data_as(ctypes.c_void_p),
        idx.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(len(idx)),
        ctypes.c_int64(record_size),
        dst.ctypes.data_as(ctypes.c_void_p),
    )
    return dst


def gather_records_sharded(
    shards: list, shard_ids: np.ndarray, rows: np.ndarray,
    out: np.ndarray | None = None,
) -> np.ndarray:
    """dst[i] = shards[shard_ids[i]][rows[i]], one multithreaded native
    call across all shards — no per-shard Python loop, no boolean-mask
    assignment (measured 200+ ms per 512-crop batch; the sharded kernel
    writes each record once, in order).

    Falls back to a numpy loop when the library is unavailable.
    """
    shard_ids = np.ascontiguousarray(shard_ids, np.int64)
    rows = np.ascontiguousarray(rows, np.int64)
    first = np.asarray(shards[0])
    if out is None:
        out = np.empty((len(rows),) + first.shape[1:], first.dtype)
    lib = _lib()
    arrs = [np.asarray(s) for s in shards]
    if lib is None or not all(a.flags["C_CONTIGUOUS"] for a in arrs):
        for i, (k, r) in enumerate(zip(shard_ids, rows)):
            out[i] = arrs[k][r]
        return out
    record_size = int(np.prod(first.shape[1:])) * first.dtype.itemsize
    srcs = (ctypes.c_void_p * len(arrs))(
        *[a.ctypes.data_as(ctypes.c_void_p).value for a in arrs]
    )
    lib.gather_records_sharded(
        srcs,
        shard_ids.ctypes.data_as(ctypes.c_void_p),
        rows.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(len(rows)),
        ctypes.c_int64(record_size),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out
