"""ctypes bindings for the native packed-store batch reader (native/).

`batch_features(store, ids, max_rows)` gathers a padded (B, max_rows, D)
feature batch with multithreaded C++ memcpy when the shared library is built
(`make -C native`), falling back to a numpy loop otherwise. This is the
TPU-host replacement for the reference's per-item h5py reads in DataLoader
workers (SURVEY.md §2.4).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Sequence

import numpy as np

_LIB = None
_LIB_TRIED = False
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")


def _load_lib(build: bool = True):
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED and not build:
        return _LIB
    so = os.path.join(_NATIVE_DIR, "libpacked_reader.so")
    if not os.path.isfile(so) and build and os.path.isdir(_NATIVE_DIR):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            pass
    _LIB_TRIED = True
    if os.path.isfile(so):
        lib = ctypes.CDLL(so)
        lib.fill_padded_batch_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int]
        lib.gather_rows_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int]
        _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load_lib() is not None


def fill_padded_batch(src: np.ndarray, starts: Sequence[int],
                      counts: Sequence[int], max_rows: int,
                      nthreads: int = 4) -> np.ndarray:
    """src: (total_rows, D) fp32 or bf16 (memmap ok) -> (B, max_rows, D)
    in src's dtype.

    bf16 rides the same C++ memcpy kernel via a byte-view: a (rows, D)
    2-byte array IS a (rows, D/2) f32 array to memcpy, so bf16-at-rest
    halves both the memmap read and the batch-buffer write bytes — the
    whole cost on a memory-bound ingest host (scripts/bench_ingest.py
    --dtype bfloat16)."""
    lib = _load_lib()
    n = len(starts)
    dim = src.shape[1]
    starts_a = np.ascontiguousarray(starts, np.int64)
    counts_a = np.ascontiguousarray(counts, np.int64)
    out = np.empty((n, max_rows, dim), src.dtype
                   if src.dtype.itemsize in (2, 4) else np.float32)
    if lib is not None and src.dtype == np.float32:
        lib.fill_padded_batch_f32(
            src.ctypes.data if isinstance(src, np.ndarray) else src,
            dim, starts_a.ctypes.data, counts_a.ctypes.data,
            n, max_rows, out.ctypes.data, nthreads)
        return out
    if lib is not None and src.dtype.itemsize == 2 and dim % 2 == 0:
        lib.fill_padded_batch_f32(
            src.ctypes.data if isinstance(src, np.ndarray) else src,
            dim // 2, starts_a.ctypes.data, counts_a.ctypes.data,
            n, max_rows, out.ctypes.data, nthreads)
        return out
    # numpy fallback
    out[:] = 0.0
    for i, (s, c) in enumerate(zip(starts_a, counts_a)):
        c = min(int(c), max_rows)
        out[i, :c] = src[int(s):int(s) + c]
    return out


def batch_features(store, image_ids: Sequence, max_rows: int = 100,
                   nthreads: int = 4) -> np.ndarray:
    """Padded feature batch straight from a PackedFeatureStore's memmap."""
    starts, counts = [], []
    for i in image_ids:
        s, c = store.index[str(i)]
        starts.append(s)
        counts.append(c)
    return fill_padded_batch(store._feat, starts, counts, max_rows,
                             nthreads=nthreads)
