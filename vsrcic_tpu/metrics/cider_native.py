"""ctypes bridge to the native CIDEr-D scorer (native/cider_scorer.cpp).

The SCST reward computes CIDEr inside every RL step (reference
coco_scripts/train.py:169-170); the Python scorer's warm path still costs
~160 ms per 1024-caption reward on dict-of-tuple ngram math. This wrapper
keeps the corpus document-frequency table resident in C++ and scores the
sampled+baseline decodes from interned word-id arrays.

Scope: the SCST configuration only — corpus-precomputed df, ONE reference
per key, both hypothesis sets scored against the same gts. Falls back to
unavailability (caller keeps the Python scorer) when the shared library
is missing. Values match metrics/cider.py to float64 round-off (pinned at
1e-12 in tests/test_cider_native.py; term-summation order differs, which
is the entire difference).
"""
from __future__ import annotations

import ctypes
import math
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from vsrcic_tpu.metrics.cider import _ngram_counts

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")

_LIB = None


def _load():
    global _LIB
    if _LIB is None:
        so = os.path.join(_NATIVE_DIR, "libcider_scorer.so")
        if not os.path.isfile(so):
            raise OSError("libcider_scorer.so not built (make -C native)")
        lib = ctypes.CDLL(so)
        lib.cider_new.restype = ctypes.c_void_p
        lib.cider_new.argtypes = [ctypes.c_double]
        lib.cider_free.argtypes = [ctypes.c_void_p]
        lib.cider_df_add.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.c_double]
        lib.cider_score_pair.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int]
        _LIB = lib
    return _LIB


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _f64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class NativeCiderPair:
    """Stateful corpus-df CIDEr-D pair scorer (SCST reward configuration).

    df_refs: the corpus references ({key: [strings]} or list of lists),
    exactly what ``Cider(gts=...)`` takes upstream (ref train.py:67).
    """

    def __init__(self, df_refs):
        self._lib = _load()
        self._intern: Dict[str, int] = {}
        if isinstance(df_refs, dict):
            df_refs = list(df_refs.values())
        df_refs = [r if isinstance(r, (list, tuple)) else [r]
                   for r in df_refs]
        # document frequency exactly as CiderScorer.precompute_df
        df: Dict[tuple, float] = {}
        for refs in df_refs:
            seen = set(ng for ref in refs
                       for ng in _ngram_counts(ref.split(), 4))
            for ng in seen:
                df[ng] = df.get(ng, 0.0) + 1.0
        self._handle = ctypes.c_void_p(
            self._lib.cider_new(math.log(float(len(df_refs)))))
        for ng, val in df.items():
            ids = np.asarray([self._wid(w) for w in ng], np.int32)
            self._lib.cider_df_add(self._handle, _i32p(ids), len(ng),
                                   ctypes.c_double(val))

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.cider_free(self._handle)
        except Exception:
            pass

    def _wid(self, w: str) -> int:
        i = self._intern.get(w)
        if i is None:
            i = len(self._intern)
            self._intern[w] = i
        return i

    def _pack(self, caps: Sequence[str]):
        ids: List[int] = []
        off = np.zeros(len(caps) + 1, np.int64)
        for i, c in enumerate(caps):
            ids.extend(self._wid(w) for w in c.split())
            off[i + 1] = len(ids)
        return np.asarray(ids, np.int32), off

    def score_pair(self, gt_caps: Sequence[str], a_caps: Sequence[str],
                   b_caps: Sequence[str]):
        """Per-image CIDEr-D (x10) for two hypothesis lists vs one GT list
        (single reference per image, the SCST reward shape)."""
        n = len(gt_caps)
        assert len(a_caps) == n and len(b_caps) == n
        gw, go = self._pack(gt_caps)
        aw, ao = self._pack(a_caps)
        bw, bo = self._pack(b_caps)
        out_a = np.zeros(n, np.float64)
        out_b = np.zeros(n, np.float64)
        nthreads = min(os.cpu_count() or 1, 16)
        self._lib.cider_score_pair(
            self._handle, ctypes.c_int64(n), _i32p(gw), _i64p(go),
            _i32p(aw), _i64p(ao), _i32p(bw), _i64p(bo),
            _f64p(out_a), _f64p(out_b), ctypes.c_int(nthreads))
        return out_a, out_b


def available() -> bool:
    try:
        _load()
        return True
    except OSError:
        return False
