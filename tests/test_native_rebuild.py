"""Pin the committed native binaries to their C++ sources (verdict r4 #6).

`native/libcider_scorer.so` and `native/libpacked_reader.so` are committed
so the framework works on hosts without a toolchain — but a committed blob
can silently drift from `native/*.cpp`. This test rebuilds both libraries
from source into a tmpdir whenever a compiler exists, points the ctypes
bridges at the rebuilt copies, and re-asserts the same equality contracts
the committed blobs are held to (CIDEr pair scores at 1e-12 vs the Python
scorer; byte-exact padded gathers vs the numpy fallback). If a source edit
changes behavior without the blob being rebuilt, the rebuilt lib and the
committed lib diverge against the shared oracle and this fails.
"""
import os
import shutil
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "native")

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None or shutil.which("make") is None,
    reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def rebuilt_dir(tmp_path_factory):
    """make-rebuild both libraries from the checked-in sources."""
    d = tmp_path_factory.mktemp("native_rebuild")
    for f in ("Makefile", "cider_scorer.cpp", "packed_reader.cpp"):
        shutil.copy(os.path.join(NATIVE, f), d)
    subprocess.run(["make", "-C", str(d)], check=True, capture_output=True)
    assert os.path.isfile(os.path.join(d, "libcider_scorer.so"))
    assert os.path.isfile(os.path.join(d, "libpacked_reader.so"))
    return str(d)


def test_rebuilt_cider_matches_python_and_committed(rebuilt_dir):
    from vsrcic_tpu.metrics import cider_native
    from vsrcic_tpu.metrics.cider import Cider

    rng = np.random.RandomState(7)
    words = ["a", "man", "dog", "rides", "red", "horse", "on", "the",
             "beach", "with", "cat", "runs"]
    mk = lambda n: [" ".join(rng.choice(words, rng.randint(3, 11)))
                    for _ in range(n)]
    corpus, gt, gen, base = mk(48), mk(24), mk(24), mk(24)
    py = Cider(gts=corpus)
    r_py, rb_py = py.compute_score_pair(
        {i: [g] for i, g in enumerate(gt)},
        {i: [c] for i, c in enumerate(gen)},
        {i: [c] for i, c in enumerate(base)})

    old_dir, old_lib = cider_native._NATIVE_DIR, cider_native._LIB
    try:
        cider_native._NATIVE_DIR, cider_native._LIB = rebuilt_dir, None
        r, rb = cider_native.NativeCiderPair(py).score_pair(gt, gen, base)
    finally:
        cider_native._NATIVE_DIR, cider_native._LIB = old_dir, old_lib
    np.testing.assert_allclose(r, r_py, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(rb, rb_py, rtol=1e-12, atol=1e-12)

    if os.path.isfile(os.path.join(NATIVE, "libcider_scorer.so")):
        rc, rcb = cider_native.NativeCiderPair(py).score_pair(gt, gen, base)
        np.testing.assert_allclose(rc, r_py, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(rcb, rb_py, rtol=1e-12, atol=1e-12)


def test_rebuilt_reader_matches_fallback_and_committed(rebuilt_dir):
    from vsrcic_tpu.data import native_reader

    rng = np.random.RandomState(8)
    src = rng.rand(600, 24).astype(np.float32)
    starts = [0, 17, 300, 590]
    counts = [17, 120, 40, 10]

    def oracle():
        out = np.zeros((len(starts), 48, 24), np.float32)
        for i, (s, c) in enumerate(zip(starts, counts)):
            c = min(c, 48)
            out[i, :c] = src[s:s + c]
        return out

    expect = oracle()

    old = (native_reader._NATIVE_DIR, native_reader._LIB,
           native_reader._LIB_TRIED)
    try:
        native_reader._NATIVE_DIR = rebuilt_dir
        native_reader._LIB, native_reader._LIB_TRIED = None, False
        assert native_reader.native_available()
        got = native_reader.fill_padded_batch(src, starts, counts,
                                              max_rows=48, nthreads=3)
    finally:
        (native_reader._NATIVE_DIR, native_reader._LIB,
         native_reader._LIB_TRIED) = old
    np.testing.assert_array_equal(got, expect)

    if native_reader.native_available():  # committed blob, same oracle
        got_c = native_reader.fill_padded_batch(src, starts, counts,
                                                max_rows=48, nthreads=3)
        np.testing.assert_array_equal(got_c, expect)
