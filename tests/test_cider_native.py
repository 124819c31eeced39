"""Native (C++) CIDEr-D pair scorer vs the Python scorer (metrics/cider.py).

The native scorer exists only to take the SCST reward off the RL step's
host critical path; it must reproduce the Python values to float64
round-off (term-summation order is the only difference). It is built FROM
the Python Cider instance (df table reused, parameters validated) so the
two cannot silently diverge."""
import numpy as np
import pytest

from vsrcic_tpu.metrics.cider import Cider

cider_native = pytest.importorskip("vsrcic_tpu.metrics.cider_native")
if not cider_native.available():
    pytest.skip("libcider_scorer.so not built", allow_module_level=True)


def _corpus(rng, n, words, lo=3, hi=12):
    return [" ".join(rng.choice(words, rng.randint(lo, hi)))
            for _ in range(n)]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_matches_python(seed):
    rng = np.random.RandomState(seed)
    words = ["a", "man", "dog", "rides", "red", "horse", "on", "the",
             "beach", "with", "cat", "runs", "small", "big"]
    corpus = _corpus(rng, 64, words)
    gt = _corpus(rng, 32, words)
    gen = _corpus(rng, 32, words)
    base = _corpus(rng, 32, words)

    py = Cider(gts=corpus)
    r_py, rb_py = py.compute_score_pair(
        {i: [g] for i, g in enumerate(gt)},
        {i: [c] for i, c in enumerate(gen)},
        {i: [c] for i, c in enumerate(base)})

    nat = cider_native.NativeCiderPair(py)
    r_nat, rb_nat = nat.score_pair(gt, gen, base)
    np.testing.assert_allclose(r_nat, r_py, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(rb_nat, rb_py, rtol=1e-12, atol=1e-12)


def test_native_edge_cases():
    corpus = ["a dog runs", "a cat sits"]
    py = Cider(gts=corpus)
    nat = cider_native.NativeCiderPair(py)
    # identical / disjoint (unseen words) / near-empty hypotheses
    gt = ["a dog runs", "a cat sits"]
    gen = ["a dog runs", "entirely different words here"]
    base = ["a", "a cat sits"]
    r_py, rb_py = py.compute_score_pair(
        {i: [g] for i, g in enumerate(gt)},
        {i: [c] for i, c in enumerate(gen)},
        {i: [c] for i, c in enumerate(base)})
    r, rb = nat.score_pair(gt, gen, base)
    np.testing.assert_allclose(r, r_py, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(rb, rb_py, rtol=1e-12, atol=1e-12)


def test_native_rejects_incompatible_cider():
    # per-batch-df mode (no corpus) must stay on the Python scorer
    with pytest.raises(ValueError):
        cider_native.NativeCiderPair(Cider())
    # non-default CIDEr parameters are not implemented natively
    with pytest.raises(ValueError):
        cider_native.NativeCiderPair(Cider(gts=["a b"], sigma=3.0))
    nat = cider_native.NativeCiderPair(Cider(gts=["a b c"]))
    with pytest.raises(ValueError):   # hard error, not a strippable assert
        nat.score_pair(["a b"], ["a"], ["a", "b"])


def test_maybe_native_knob(monkeypatch):
    py = Cider(gts=["a dog runs"])
    assert cider_native.maybe_native(py, verbose=False) is not None
    monkeypatch.setenv("VSRCIC_NATIVE_CIDER", "0")
    assert cider_native.maybe_native(py, verbose=False) is None
    monkeypatch.delenv("VSRCIC_NATIVE_CIDER")
    assert cider_native.maybe_native(Cider(), verbose=False) is None
