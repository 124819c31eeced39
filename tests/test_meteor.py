"""Native METEOR: hand-computed scores for the documented algorithm
(METEOR 1.5 formulas, English defaults alpha=.85 beta=.2 gamma=.6,
exact=1.0 / stem=0.6 / paraphrase=0.6 — vsrcic_tpu/metrics/meteor.py,
replacing ref eval_coco.py:277's jar call)."""
import math
import os

import numpy as np
import pytest

from vsrcic_tpu.metrics.meteor import NativeMeteor, _align, _score_from_stats


def pair_score(hyp, refs, **kw):
    return NativeMeteor(**kw).sentence_stats(hyp, refs)[0]


def test_identical_scores_one():
    s = pair_score("a cat sits on the mat", ["a cat sits on the mat"])
    assert s == pytest.approx(1.0)


def test_no_match_scores_zero():
    assert pair_score("dog", ["elephant"]) == 0.0
    assert pair_score("", ["a cat"]) == 0.0


def test_prefix_match_hand_computed():
    # hyp 'the cat sat' vs ref 'the cat sat down': m=3/3, one chunk but
    # ref not fully covered -> penalty stays. P=1, R=3/4,
    # Fmean=.75/.9625, pen=.6*(1/3)^.2
    s = pair_score("the cat sat", ["the cat sat down"])
    fmean = 0.75 / (0.85 * 1.0 + 0.15 * 0.75)
    pen = 0.6 * (1.0 / 3.0) ** 0.2
    assert s == pytest.approx(fmean * (1 - pen), abs=1e-12)


def test_stem_stage_weight():
    # 'he'(exact 1.0) + runs/running, quickly/quick (stem 0.6 each), all
    # words covered in one chunk -> no penalty; P=R=2.2/3
    s = pair_score("he runs quickly", ["he running quick"])
    assert s == pytest.approx(2.2 / 3.0, abs=1e-12)


def test_scrambled_order_pays_chunk_penalty():
    ref = "a cat sits on the mat"
    hyp = "mat the on sits cat a"
    # all 6 exact-matched but 6 chunks: frag=1, pen=.6, Fmean=1
    assert pair_score(hyp, [ref]) == pytest.approx(0.4, abs=1e-12)


def test_multi_reference_takes_best():
    s = pair_score("the cat sat", ["a dog", "the cat sat"])
    assert s == pytest.approx(1.0)


def test_corpus_is_aggregate_not_mean():
    m = NativeMeteor()
    gts = {1: ["the cat sat"], 2: ["a big dog runs far away today ok"]}
    res = {1: ["the cat sat"], 2: ["entirely unrelated words here"]}
    final, seg = m.compute_score(gts, res)
    assert seg[0] == pytest.approx(1.0) and seg[1] == 0.0
    # aggregate: stats summed then scored (not the segment mean 0.5)
    st1 = m.sentence_stats("the cat sat", gts[1])[1]
    st2 = m.sentence_stats("entirely unrelated words here", gts[2])[1]
    agg = [a + b for a, b in zip(st1, st2)]
    assert final == pytest.approx(_score_from_stats(*agg), abs=1e-12)
    assert final != pytest.approx(float(np.mean(seg)))


def test_paraphrase_table_hook(tmp_path):
    tab = tmp_path / "para.tsv"
    tab.write_text("big cat\tlarge feline\n")
    s = pair_score("a big cat", ["a large feline"],
                   paraphrase_table=str(tab))
    # exact 'a' + 2-word paraphrase span at weight .6, full single-chunk
    # cover -> no penalty; P=R=(1+.6+.6)/3
    assert s == pytest.approx(2.2 / 3.0, abs=1e-12)
    assert pair_score("a big cat", ["a large feline"]) < s  # without table


def test_duplicate_words_take_closest_occurrence():
    # hyp 'the the cat': both 'the' present in ref 'the cat the' —
    # closest-occurrence keeps alignment monotone where possible
    m_h, m_r, wm_h, wm_r, ch = _align(
        "the cat the".split(), "the cat the".split(), None)
    assert (m_h, m_r, ch) == (3, 3, 0)


def test_compute_score_api_shapes():
    m = NativeMeteor()
    gts = {"a": ["x y z", "x y"], "b": ["q r"]}
    res = {"a": ["x y z"], "b": ["q z"]}
    final, seg = m.compute_score(gts, res)
    assert isinstance(final, float) and seg.shape == (2,)
    assert 0.0 <= final <= 1.0


def _oracle_align(hyp, ref):
    """Brute-force the jar objective: max matches, min chunks, max weight,
    min total |i-j| — over ALL one-to-one unigram assignments."""
    from vsrcic_tpu.metrics.meteor import _unigram_candidates
    cand = _unigram_candidates(hyp, ref)
    best = [None]

    def rec(i, mask, pairs):
        if i == len(hyp):
            chunks, prev = 0, None
            for (pi, pj, _) in pairs:
                if not (prev and pi - prev[0] == 1 and pj - prev[1] == 1):
                    chunks += 1
                prev = (pi, pj)
            key = (len(pairs), -chunks, sum(p[2] for p in pairs),
                   -sum(abs(pi - pj) for pi, pj, _ in pairs))
            if best[0] is None or key > best[0]:
                best[0] = key
            return
        rec(i + 1, mask, pairs)
        for j, wt in cand[i]:
            if not mask >> j & 1:
                rec(i + 1, mask | 1 << j, pairs + [(i, j, wt)])

    rec(0, 0, [])
    return best[0]


def _beam_key(hyp, ref):
    from vsrcic_tpu.metrics.meteor import _search_unigram_alignment
    pairs = sorted(_search_unigram_alignment(hyp, ref))
    chunks, prev = 0, None
    for (pi, pj, _) in pairs:
        if not (prev and pi - prev[0] == 1 and pj - prev[1] == 1):
            chunks += 1
        prev = (pi, pj)
    return (len(pairs), -chunks, sum(p[2] for p in pairs),
            -sum(abs(pi - pj) for pi, pj, _ in pairs))


def test_aligner_matches_bruteforce_oracle():
    """Fuzz the beam aligner against exhaustive search on adversarial
    word orders: tiny vocab forces duplicate keys, and mixed inflections
    ('run'/'running'/'runs') force exact-vs-stem weight choices. The
    round-4 left-to-right closest-occurrence aligner FAILS this on
    crossing duplicates; the beam must realize the exact jar objective
    (matches, chunks, weight, distance) on every draw."""
    rng = np.random.RandomState(0)
    vocab = ["dog", "dogs", "run", "running", "runs", "the", "cat", "a"]
    for trial in range(300):
        nh = rng.randint(1, 8)
        nr = rng.randint(1, 8)
        hyp = [vocab[k] for k in rng.randint(0, len(vocab), nh)]
        ref = [vocab[k] for k in rng.randint(0, len(vocab), nr)]
        # compare the SCORE-RELEVANT stats (matches, chunks, weight)
        # exactly; the |i-j| distance tiebreak only disambiguates between
        # score-identical alignments and the beam may pick a different
        # (score-equal) one under pruning
        assert _beam_key(hyp, ref)[:3] == _oracle_align(hyp, ref)[:3], \
            (hyp, ref)


def test_aligner_beats_greedy_on_crossing_duplicates():
    """A concrete adversarial order where closest-occurrence matching
    yields more chunks than optimal: the oracle (and beam) find the
    2-chunk alignment."""
    hyp = "the cat the dog".split()
    ref = "the dog the cat".split()
    key = _beam_key(hyp, ref)
    assert key[0] == 4          # all words matched
    assert -key[1] == 2         # two chunks ('the cat' / 'the dog')
