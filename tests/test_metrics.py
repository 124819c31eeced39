"""Unit tests for the native metrics suite (hand-computed golden values)."""
import math

import numpy as np
import pytest

from vsrcic_tpu.metrics import Bleu, Cider, Rouge
from vsrcic_tpu.text.tokenizer import ptb_tokenize
from vsrcic_tpu.text.vocab import TextField, dedup_join
from vsrcic_tpu.utils.rank_merge import verb_rank_merge


def test_bleu_perfect_match():
    gts = {0: ["a man rides a horse"]}
    res = {0: ["a man rides a horse"]}
    scores, _ = Bleu(4).compute_score(gts, res)
    for s in scores:
        assert s == pytest.approx(1.0, abs=1e-6)


def test_bleu_unigram_hand_value():
    # hyp: "the cat" vs ref: "the cat sat" -> p1=1, brevity penalty e^(1-3/2)
    gts = {0: ["the cat sat"]}
    res = {0: ["the cat"]}
    scores, _ = Bleu(4).compute_score(gts, res)
    assert scores[0] == pytest.approx(math.exp(1 - 3 / 2), rel=1e-6)


def test_rouge_identical():
    gts = {0: ["a dog in the park"]}
    res = {0: ["a dog in the park"]}
    score, _ = Rouge().compute_score(gts, res)
    assert score == pytest.approx(1.0)


def test_rouge_hand_value():
    # hyp "a b c", ref "a c d": LCS=2; p=2/3, r=2/3 -> F=2/3
    score, _ = Rouge().compute_score({0: ["a c d"]}, {0: ["a b c"]})
    assert score == pytest.approx(2 / 3, rel=1e-6)


def test_cider_identical_beats_different():
    gts = {0: ["a man rides a horse"], 1: ["a cat sits on a mat"]}
    res_good = {0: ["a man rides a horse"], 1: ["a cat sits on a mat"]}
    res_bad = {0: ["blue bird flies high today"], 1: ["trucks drive on roads"]}
    good, _ = Cider().compute_score(gts, res_good)
    bad, _ = Cider().compute_score(gts, res_bad)
    assert good > bad
    assert good > 0


def test_cider_precomputed_df_matches_inline():
    gts = {0: ["a man rides a horse"], 1: ["a cat sits on a mat"]}
    res = {0: ["a man rides a horse"], 1: ["a dog sits"]}
    inline, per1 = Cider().compute_score(gts, res)
    pre = Cider(gts=gts)
    pre_mean, per2 = pre.compute_score(gts, res)
    np.testing.assert_allclose(per1, per2)


def test_ptb_tokenize():
    out = ptb_tokenize({0: ["A man, riding a horse."]})
    assert out[0] == ["a man riding a horse"]
    out = ptb_tokenize(["Don't stop me now!"])
    assert out[0] == "do n't stop me now"


def test_text_field_vocab_order_and_roundtrip():
    caps = ["a man rides a horse", "a man walks", "horse horse horse"]
    tf = TextField(fix_length=10)
    tf.build_vocab(caps, min_freq=1)
    # specials first
    assert tf.vocab.itos[:4] == ["<unk>", "<pad>", "<bos>", "<eos>"]
    # freq order: a(3)+horse(4)? horse appears 1+3=4, a=3, man=2 ...
    assert tf.vocab.itos[4] == "horse"
    assert tf.vocab.itos[5] == "a"
    ids = tf.process(["a man rides"])
    assert ids[0][0] == tf.bos_idx
    assert list(ids[0][4:5]) == [tf.eos_idx]
    dec = tf.decode(ids[0][1:])
    assert dec == "a man rides"


def test_verb_rank_merge_oracle():
    # oracle cases executed against the reference implementation semantics
    assert verb_rank_merge([1, 2, 3], [2, 4, 3]) == [1, 2, 4, 3]
    assert verb_rank_merge([1, 2], [3, 4]) == [1, 2, 3, 4]
    assert verb_rank_merge([5, 1], [1, 5]) == [5, 1]
    assert verb_rank_merge([], [7, 8]) == [7, 8]
    assert verb_rank_merge([3, 9], [0, 3]) == [0, 3, 9]


def test_verb_rank_merge_matches_reference():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_tools", "/root/reference/utils/tools.py")
    ref_tools = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_tools)
    rng = np.random.RandomState(0)
    for _ in range(200):
        n = rng.randint(1, 8)
        m = rng.randint(1, 8)
        pool = list(rng.permutation(12))
        la = pool[:n]
        lb = list(rng.permutation(pool[: rng.randint(1, 12)]))[:m]
        assert verb_rank_merge(list(la), list(lb)) == \
            ref_tools.verb_rank_merge(list(la), list(lb))


def test_dedup_join():
    assert dedup_join(["a", "a", "man", "man", "man", "runs"]) == "a man runs"


def test_cider_pair_matches_two_calls():
    """compute_score_pair must be bit-identical to two compute_score calls
    (it exists only to cook the references once — the SCST reward path)."""
    import numpy as np
    from vsrcic_tpu.metrics.cider import Cider

    rng = np.random.RandomState(1)
    words = "a man dog rides red horse on the beach with".split()
    def cap():
        return " ".join(rng.choice(words, rng.randint(4, 9)))
    gts = {i: [cap(), cap()] for i in range(20)}
    a = {i: [cap()] for i in range(20)}
    b = {i: [cap()] for i in range(20)}
    for cider in (Cider(), Cider(gts=list(gts.values()))):
        _, ra = cider.compute_score(gts, a)
        _, rb = cider.compute_score(gts, b)
        pa, pb = cider.compute_score_pair(gts, a, b)
        assert np.array_equal(ra, pa) and np.array_equal(rb, pb)


def test_cider_ref_vec_cache_is_value_exact():
    """Corpus-df mode memoizes ref vectors across calls; a warm cache must
    produce bit-identical scores to a fresh scorer (SCST rescores the same
    GTs every epoch)."""
    import numpy as np
    from vsrcic_tpu.metrics.cider import Cider

    rng = np.random.RandomState(2)
    words = "a man dog rides red horse on the beach with".split()
    def cap():
        return " ".join(rng.choice(words, rng.randint(4, 9)))
    gts = {i: [cap(), cap()] for i in range(16)}
    hyps = [{i: [cap()] for i in range(16)} for _ in range(3)]
    warm = Cider(gts=list(gts.values()))
    outs_warm = [warm.compute_score(gts, h)[1] for h in hyps]   # reuse cache
    for h, w in zip(hyps, outs_warm):
        fresh = Cider(gts=list(gts.values()))
        _, f = fresh.compute_score(gts, h)
        assert np.array_equal(f, w)
