"""Native SPICE: parser goldens + scoring-formula pins.

The scoring model is the SPICE paper's F1 over scene-graph tuple sets
(ref consumes it via spice-1.0.jar, coco_scripts/eval_coco.py:286); the
parser is this project's caption-grammar chunker (metrics/spice.py
docstring records the divergences). These tests pin BOTH: the parser on
hand-derived caption graphs, and the F1 on hand-computed overlaps.
"""
import numpy as np
import pytest

from vsrcic_tpu.metrics.spice import NativeSpice, parse_scene_graph


# ---- parser goldens (hand-derived) ----------------------------------------

CASES = [
    ("a man riding a horse on a beach",
     {("man",), ("horse",), ("beach",),
      ("man", "ride", "horse"), ("horse", "on", "beach")}),
    ("a brown dog", {("dog",), ("dog", "brown")}),
    ("the dog is brown", {("dog",), ("dog", "brown")}),
    ("two dogs playing with a ball",
     {("dog",), ("ball",), ("dog", "two"), ("dog", "play with", "ball")}),
    ("a man and a woman sit on a bench",
     {("man",), ("woman",), ("bench",),
      ("man", "sit on", "bench"), ("woman", "sit on", "bench")}),
    ("a dog running", {("dog",), ("dog", "run")}),
    ("the car is parked in a lot",
     {("car",), ("lot",), ("car", "park in", "lot")}),
    ("a young girl standing on top of a tennis court",
     {("girl",), ("court",), ("girl", "young"), ("court", "tennis"),
      ("girl", "stand on top of", "court")}),
    ("a tall building behind a red bus",
     {("building",), ("bus",), ("building", "tall"), ("bus", "red"),
      ("building", "behind", "bus")}),
    ("children are flying kites in the park",
     {("child",), ("kite",), ("park",),
      ("child", "fly", "kite"), ("kite", "in", "park")}),
    # -ing nouns are not verbs; irregular plurals; copula+det equates
    ("the building is a museum",
     {("building",), ("museum",), ("building", "be", "museum")}),
    ("men eating sandwiches",
     {("man",), ("sandwich",), ("man", "eat", "sandwich")}),
]


@pytest.mark.parametrize("caption,expected", CASES,
                         ids=[c for c, _ in CASES])
def test_parser_golden(caption, expected):
    assert set(parse_scene_graph(caption)) == expected


def test_gerund_modifier_matches_trailing_verb():
    # "a running dog" and "a dog running" must yield the same tuples —
    # gerund NP modifiers lemmatize like verbs
    assert parse_scene_graph("a running dog") \
        == parse_scene_graph("a dog running") \
        == frozenset({("dog",), ("dog", "run")})


def test_parser_deterministic_and_set_semantics():
    g1 = parse_scene_graph("a dog and a dog running")
    g2 = parse_scene_graph("a dog and a dog running")
    assert g1 == g2
    # duplicate mentions collapse (tuple SETS, as the jar scores)
    assert ("dog",) in g1 and len([t for t in g1 if t == ("dog",)]) == 1


# ---- scoring formula (hand-computed) ---------------------------------------

def test_f1_identical_caption_is_one():
    sp = NativeSpice()
    gts = {0: ["a man riding a horse"]}
    res = {0: ["a man riding a horse"]}
    score, per = sp.compute_score(gts, res)
    assert score == 1.0 and per.shape == (1,)


def test_f1_disjoint_is_zero():
    sp = NativeSpice()
    score, _ = sp.compute_score({0: ["a red car"]}, {0: ["a small dog"]})
    assert score == 0.0


def test_f1_partial_overlap_hand_computed():
    # cand = {man, horse, (man,ride,horse)}  (3 tuples, all matched)
    # refs merged = 9 tuples (see below) -> P=1, R=3/9, F1=0.5
    sp = NativeSpice()
    gts = {0: ["a man riding a horse on a beach",
               "a person rides a horse near the ocean"]}
    res = {0: ["a man riding a horse"]}
    merged = (parse_scene_graph(gts[0][0]) | parse_scene_graph(gts[0][1]))
    assert len(merged) == 9
    score, per = sp.compute_score(gts, res)
    assert per[0] == pytest.approx(0.5)


def test_multi_reference_union_not_best_single():
    # the tuple matched by ref2 only still counts (graphs are merged,
    # unlike METEOR's best-single-reference)
    sp = NativeSpice()
    gts = {0: ["a man", "a horse"]}
    res = {0: ["a man and a horse"]}
    _, per = sp.compute_score(gts, res)
    assert per[0] == 1.0


def test_empty_sides_are_zero_not_nan():
    sp = NativeSpice()
    score, per = sp.compute_score({0: ["of of of"]}, {0: ["a dog"]})
    assert score == 0.0 and np.isfinite(per).all()


def test_mean_over_images():
    sp = NativeSpice()
    gts = {0: ["a man riding a horse"], 1: ["a red car"]}
    res = {0: ["a man riding a horse"], 1: ["a dog"]}
    score, per = sp.compute_score(gts, res)
    assert score == pytest.approx(per.mean()) and per[0] == 1.0


# ---- eval-CLI fallback wiring ----------------------------------------------

def test_eval_cli_prefers_jar_else_native(monkeypatch):
    monkeypatch.delenv("VSRCIC_SPICE_JAR", raising=False)
    from vsrcic_tpu.metrics import ExternalMetricUnavailable, Spice
    with pytest.raises(ExternalMetricUnavailable):
        Spice().compute_score({0: ["a dog"]}, {0: ["a dog"]})
    # the native fallback scores the same inputs
    score, _ = NativeSpice().compute_score({0: ["a dog"]}, {0: ["a dog"]})
    assert score == 1.0


# ---- corpus-scale robustness (round-5: verdict item #4) --------------------

def test_corpus_parse_coverage_thresholds():
    """Pin the coverage stats over the 252-caption robustness corpus
    (realistic COCO/Flickr phrasing: out-of-lexicon verbs, passives,
    conjunctions, noun/verb homographs). Measured by
    scripts/spice_coverage.py; numbers recorded in docs/PARITY.md.
    Floors are set just under the measured values so a lexicon or
    parser-rule regression trips them."""
    import os
    from vsrcic_tpu.metrics.spice import parse_coverage
    corpus = os.path.join(os.path.dirname(__file__), "data",
                          "spice_robustness_corpus.txt")
    with open(corpus) as f:
        captions = [ln.strip() for ln in f if ln.strip()]
    assert len(captions) >= 250
    stats = parse_coverage(captions)
    # every content token reaches the graph (measured 1.0)
    assert stats["consumed_frac"] >= 0.99, stats["top_missed"]
    # verbs land as edges, not mis-parsed nouns (measured 0.9563)
    assert stats["verb_edge_frac"] >= 0.93
    assert stats["empty_parse_frac"] == 0.0
    assert stats["tuples_per_caption"] >= 4.5


def test_homograph_compounds_stay_nominal():
    """The lexicon widening must NOT break NP compounds built on
    noun/verb homographs — the reason bare homographs are excluded
    from VERB_BASE (spice.py VERB_BASE comment)."""
    g = parse_scene_graph("a dog park near a baseball bat")
    assert ("park",) in g and ("bat",) in g and ("bat", "baseball") in g
    assert not any(len(t) == 3 and "park" in t[1] for t in g)


def test_positional_verb_fallback():
    """Out-of-lexicon -s/-ed forms before a determiner parse as verbs
    (the round-4 silent-noun gap): 'grips' is in no lexicon."""
    g = parse_scene_graph("a man grips a racket")
    assert ("man", "grip", "racket") in g
