"""ctypes bridge to the native CIDEr-D scorer (native/cider_scorer.cpp).

The SCST reward computes CIDEr inside every RL step (reference
coco_scripts/train.py:169-170); the Python scorer's warm path still costs
~160-330 ms per 1024-caption reward on dict-of-tuple ngram math. This
wrapper keeps the corpus document-frequency table resident in C++ and
scores the sampled+baseline decodes from interned word-id arrays.

Scope: the SCST configuration only — corpus-precomputed df, ONE reference
per key, both hypothesis sets scored against the same gts, the default
n=4 / sigma=6 CIDEr-D parameters (construction validates all of this
against the paired Cider instance). Values match metrics/cider.py to
float64 round-off (pinned at 1e-12 in tests/test_cider_native.py;
term-summation order differs, which is the entire difference).
"""
from __future__ import annotations

import ctypes
import os
from typing import Dict, List, Sequence

import numpy as np

from vsrcic_tpu.metrics.cider import Cider

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
        lib.cider_df_load_csr.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64]
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

    Build with ``NativeCiderPair(cider)`` from the SAME corpus-df Cider
    the trainer scores with — the df table is taken from it directly (no
    recomputation) and the parameters are validated, so native and Python
    rewards cannot silently diverge.
    """

    def __init__(self, cider: Cider):
        sc = cider.scorer
        if sc.doc_frequency is None:
            raise ValueError(
                "native CIDEr requires a corpus-df Cider (Cider(gts=...), "
                "ref train.py:67); per-batch-df mode stays on the Python "
                "scorer")
        if sc.n != 4 or sc.sigma != 6.0:
            raise ValueError(
                "native CIDEr implements the default n=4/sigma=6 CIDEr-D; "
                "got n=%d sigma=%s" % (sc.n, sc.sigma))
        self._lib = _load()
        self._intern: Dict[str, int] = {}
        self._handle = ctypes.c_void_p(self._lib.cider_new(sc.ref_len))
        # pack the ALREADY-COMPUTED df into CSR and load it in one call
        # (a per-ngram ctypes loop measured 10 us/ngram)
        ids: List[int] = []
        off = np.zeros(len(sc.doc_frequency) + 1, np.int64)
        vals = np.zeros(len(sc.doc_frequency), np.float64)
        for i, (ng, val) in enumerate(sc.doc_frequency.items()):
            ids.extend(self._wid(w) for w in ng)
            off[i + 1] = len(ids)
            vals[i] = val
        words = np.asarray(ids, np.int32)
        self._lib.cider_df_load_csr(self._handle, _i32p(words), _i64p(off),
                                    _f64p(vals),
                                    ctypes.c_int64(len(vals)))

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
        if len(a_caps) != n or len(b_caps) != n:
            # hard error (not assert): a stripped assert under python -O
            # would let mismatched CSR lengths reach C++ and read OOB
            raise ValueError("caption list lengths differ: gt=%d a=%d b=%d"
                             % (n, len(a_caps), len(b_caps)))
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


def maybe_native(cider: Cider, verbose: bool = True):
    """The shared opt-in: returns a NativeCiderPair for ``cider`` when the
    library is built and VSRCIC_NATIVE_CIDER != 0, else None (callers keep
    the Python scorer). One definition of the knob name/default/fallback
    for the train CLI and bench_scst."""
    if not bool(int(os.environ.get("VSRCIC_NATIVE_CIDER", "1"))):
        return None
    try:
        nat = NativeCiderPair(cider)
    except (OSError, ValueError):
        return None
    if verbose:
        print("SCST reward: native C++ CIDEr scorer "
              "(VSRCIC_NATIVE_CIDER=0 for the Python path)")
    return nat


def available() -> bool:
    try:
        _load()
        return True
    except OSError:
        return False
