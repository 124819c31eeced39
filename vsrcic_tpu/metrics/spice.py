"""Native SPICE (semantic propositional F1 over scene-graph tuples).

The reference scores SPICE through speaksee's bundled ``spice-1.0.jar``
(ref coco_scripts/eval_coco.py:286, flickr_scripts/eval_flickr.py:293) — a
Java pipeline (Stanford PCFG parse -> rule-based scene-graph transform ->
WordNet-synset tuple matching, Anderson et al. 2016).  This module makes the
9th metric producible without external provisioning: the SCORING MODEL is
the paper's exactly, while the scene-graph PARSER is a caption-grammar
chunker built for the COCO/Flickr caption domain.

Scoring (identical to the jar's "All" section):
    T(G)  = objects  {(o,)}  ∪  attributes {(o, a)}  ∪  relations {(s, r, o)}
    G(S)  = union of the reference captions' graphs (tuple-set union)
    P     = |T(G(c)) ∩ T(G(S))| / |T(G(c))|
    R     = |T(G(c)) ∩ T(G(S))| / |T(G(S))|
    F1    = 2PR / (P + R)        (0 when either side is empty)
Corpus score is the mean of per-image F1, as the jar reports.

DOCUMENTED DIVERGENCES from spice-1.0.jar (a different *parser*, not a
different metric — both hypothesis and references go through the SAME
parser, so the F1 remains a self-consistent propositional-overlap score):
  * scene-graph extraction: the jar dependency-parses with the Stanford
    PCFG model (a ~200 MB resource this environment cannot provision) and
    applies SceneGraphParser's tree transforms; here a deterministic
    left-to-right chunker over the closed-class caption grammar
    (NP := det? num? mod* head;  S := NP (cop)? (verb NP?)? PP*) extracts
    the same tuple classes.  PPs attach low (to the nearest NP head);
    "and" distributes a following verb over the conjoined heads.
  * tuple matching: the jar matches via WordNet synset overlap (needs the
    WordNet corpus); here matching is exact on lemmas.  Scores are a lower
    bound on the jar's, tighter than it sounds on captions because both
    sides are lemmatized by the same rules.
  * lemmatization: Stanford Morphology is replaced by rule lemmas
    (plural strip + irregular table for nouns; -ing/-ed/-s strip with
    doubling/e-restoration for verbs).

API mirrors the other metrics: ``compute_score(gts, res) -> (float,
np.ndarray)`` over PTB-tokenized caption dicts.  The eval CLI prefers the
real jar when ``VSRCIC_SPICE_JAR`` is set (metrics/external.py) and falls
back to this module, labeling the row ``SPICE(native)``.
"""
from __future__ import annotations

from typing import Dict, FrozenSet, List, Sequence, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# closed-class lexicons (caption grammar)
# ---------------------------------------------------------------------------

DETS = {"a", "an", "the", "this", "that", "these", "those", "some", "its",
        "his", "her", "their", "each", "every", "no", "another", "other"}
NUMBERS = {"one": "one", "two": "two", "three": "three", "four": "four",
           "five": "five", "six": "six", "seven": "seven", "eight": "eight",
           "nine": "nine", "ten": "ten", "several": "several",
           "many": "many", "few": "few", "couple": "couple"}
PREPS = {"in", "on", "at", "by", "with", "near", "under", "over", "above",
         "below", "behind", "beside", "between", "against", "around",
         "across", "along", "through", "into", "onto", "inside", "outside",
         "atop", "beneath", "upon", "off", "from", "to", "of", "for",
         "without", "toward", "towards", "past", "amid", "among", "beyond",
         "underneath", "down", "up"}
# multi-word prepositions, joined before parsing (longest first)
MULTI_PREPS = [("on", "top", "of"), ("in", "front", "of"),
               ("next", "to"), ("close", "to"), ("out", "of")]
COPULAS = {"is", "are", "was", "were", "be", "been", "being", "'s"}
CONJ = {"and"}
PRONOUNS = {"it", "he", "she", "they", "someone", "something", "people"}
# common caption verbs that do not end in -ing/-s/-ed (base or irregular)
VERB_BASE = {"sit", "stand", "ride", "hold", "eat", "play", "run", "walk",
             "jump", "look", "watch", "wear", "fly", "hang", "lie", "lean",
             "sleep", "swim", "drive", "carry", "throw", "catch", "hit",
             "cut", "read", "graze", "rest", "wait", "pose", "smile",
             "drink", "talk", "stare", "gaze", "perch", "surf", "ski",
             "skate", "cook", "serve", "feed", "pull", "push"}
VERB_IRREG = {"sits": "sit", "stands": "stand", "rides": "ride",
              "holds": "hold", "eats": "eat", "plays": "play", "runs": "run",
              "walks": "walk", "jumps": "jump", "wears": "wear",
              "flies": "fly", "hangs": "hang", "lies": "lie",
              "sat": "sit", "stood": "stand", "rode": "ride", "held": "hold",
              "ate": "eat", "ran": "run", "wore": "wear", "flew": "fly",
              "hung": "hang", "lay": "lie", "slept": "sleep",
              "swam": "swim", "drove": "drive", "threw": "throw",
              "caught": "catch", "fed": "feed", "drank": "drink"}
# -ing words that are nouns in caption usage, not gerunds
GERUND_NOUNS = {"building", "painting", "ceiling", "clothing", "railing",
                "awning", "dressing", "icing", "frosting", "lightning",
                "evening", "morning", "topping", "seasoning", "landing",
                "crossing", "living", "dining", "wedding", "clearing",
                "carriage", "spring", "string", "ring", "wing", "king",
                "thing", "swing", "earring"}
NOUN_IRREG_PLURAL = {"men": "man", "women": "woman", "children": "child",
                     "people": "person", "feet": "foot", "teeth": "tooth",
                     "mice": "mouse", "geese": "goose", "leaves": "leaf",
                     "knives": "knife", "wolves": "wolf", "shelves": "shelf",
                     "loaves": "loaf", "scarves": "scarf", "wives": "wife",
                     "lives": "life", "sheep": "sheep", "deer": "deer",
                     "buses": "bus", "dishes": "dish", "benches": "bench",
                     "glasses": "glass", "dresses": "dress",
                     "sandwiches": "sandwich", "beaches": "beach",
                     "couches": "couch", "watches": "watch",
                     "boxes": "box", "foxes": "fox", "skis": "ski"}
# words that end in s but are singular (not stripped)
S_SINGULAR = {"grass", "glass", "bus", "dress", "tennis", "gas", "chess",
              "cross", "moss", "brass", "class", "pants", "scissors",
              "jeans", "shorts", "sunglasses", "stairs", "bananas"}
ADVERB_SKIP = {"very", "really", "quite", "extremely", "together", "also",
               "just", "still", "there", "here", "while", "as", "not"}

_VOWELS = set("aeiou")


def _lemma_noun(word: str) -> str:
    """Singularize a noun with rule lemmas + an irregular table."""
    if word in NOUN_IRREG_PLURAL:
        return NOUN_IRREG_PLURAL[word]
    if word in S_SINGULAR or len(word) <= 3:
        return word
    if word.endswith("ies") and len(word) > 4:
        return word[:-3] + "y"                       # puppies -> puppy
    if word.endswith(("ches", "shes", "xes", "sses", "zes")):
        return word[:-2]                             # benches -> bench
    if word.endswith("s") and not word.endswith(("ss", "us", "is")):
        return word[:-1]                             # dogs -> dog
    return word


def _lemma_verb(word: str) -> str:
    """Base-form a verb: irregular table, then -ing/-ed/-s strip with
    consonant-doubling and silent-e restoration heuristics."""
    if word in VERB_IRREG:
        return VERB_IRREG[word]
    if word in VERB_BASE:
        return word
    for suf in ("ing", "ed"):
        if word.endswith(suf) and len(word) > len(suf) + 2:
            stem = word[: -len(suf)]
            if len(stem) > 2 and stem[-1] == stem[-2] and stem[-1] not in _VOWELS \
                    and stem[-1] not in "sl":
                return stem[:-1]                     # running -> run
            if (len(stem) > 2 and stem[-1] not in _VOWELS
                    and stem[-2] in _VOWELS and stem[-3] not in _VOWELS
                    and not stem.endswith(("w", "x", "y"))
                    and stem not in VERB_BASE):
                return stem + "e"                    # riding -> ride
            return stem                              # standing -> stand
    if word.endswith("es") and len(word) > 4:
        return word[:-2]
    if word.endswith("s") and not word.endswith("ss") and len(word) > 3:
        return word[:-1]
    return word


def _is_verb(word: str, after_copula: bool) -> bool:
    if word in VERB_BASE or word in VERB_IRREG:
        return True
    if word.endswith("ing") and word not in GERUND_NOUNS and len(word) > 4:
        return True
    if after_copula and word.endswith("ed") and len(word) > 4:
        return True                                  # "is parked"
    return False


def _join_multi_preps(tokens: List[str]) -> List[str]:
    out: List[str] = []
    i = 0
    while i < len(tokens):
        matched = False
        for mp in MULTI_PREPS:
            if tuple(tokens[i:i + len(mp)]) == mp:
                out.append(" ".join(mp))
                i += len(mp)
                matched = True
                break
        if not matched:
            out.append(tokens[i])
            i += 1
    return out


Tuples = FrozenSet[Tuple[str, ...]]


def parse_scene_graph(caption: str) -> Tuples:
    """Parse one PTB-tokenized caption into its scene-graph tuple set.

    Returns a frozenset mixing (object,), (object, attribute) and
    (subject, relation, object) tuples, all rule-lemmatized.  Deterministic
    left-to-right chunking; see the module docstring for the grammar and
    the divergences from the Stanford pipeline.
    """
    raw = [t for t in caption.lower().split()
           if t not in ADVERB_SKIP and (t.isalpha() or t == "'s")]
    toks = _join_multi_preps(raw)

    objects: set = set()
    attrs: set = set()
    rels: set = set()

    subj_group: List[str] = []    # heads a following verb distributes over
    last_head: str = ""           # PP / copula attachment point
    pending: Tuple[str, str] = ("", "")   # ("verb"|"prep"|"cop", label)
    conj_open = False             # saw "and" right after an NP

    i, n = 0, len(toks)
    while i < n:
        t = toks[i]
        if t in CONJ:
            conj_open = True
            i += 1
            continue
        if t in COPULAS:
            pending = ("cop", "")
            i += 1
            continue
        if t in PREPS or " " in t:
            pv = pending
            if pv[0] == "verb":
                # "sitting on" -> merged relation label "sit on"
                pending = ("verb", pv[1] + " " + t)
            else:
                pending = ("prep", t)
            i += 1
            continue
        if _is_verb(t, after_copula=pending[0] == "cop") and last_head:
            pending = ("verb", _lemma_verb(t))
            i += 1
            continue

        # ---- NP chunk: det? (num|mod)* head ------------------------------
        mods: List[str] = []
        head = ""
        saw_det = False
        while i < n:
            w = toks[i]
            if w in CONJ or w in COPULAS or w in PREPS or " " in w:
                break
            if head and _is_verb(w, after_copula=False):
                break                                 # "a man riding ..."
            if w in DETS:
                if head:
                    break                             # next NP starts
                saw_det = True
                i += 1
                continue
            if head:
                mods.append(head)                     # longer NP: shift
            head = w
            i += 1
        if not head:
            i += 1
            continue

        kind, label = pending
        if kind == "cop" and last_head and not saw_det and not mods:
            # copula + bare word: predicative adjective ("the dog is
            # brown") — attribute of the subject, not a new object
            attrs.add((last_head, head))
            pending = ("", "")
            conj_open = False
            continue

        head_l = head if head in PRONOUNS and head != "people" \
            else _lemma_noun(head)
        objects.add((head_l,))
        for m in mods:
            # gerund modifiers lemmatize like verbs so "a running dog"
            # and "a dog running" yield the same (dog, run) tuple
            if m.endswith("ing") and m not in GERUND_NOUNS and len(m) > 4:
                m = _lemma_verb(m)
            attrs.add((head_l, NUMBERS.get(m, m)))

        if kind == "verb" and subj_group:
            for s in subj_group:
                rels.add((s, label, head_l))
            subj_group = [head_l]                     # object can head a PP
        elif kind == "prep" and last_head:
            rels.add((last_head, label, head_l))
            subj_group = [head_l]
        elif kind == "cop" and last_head:
            # copula straight into a det-NP ("the animal is a dog")
            rels.add((last_head, "be", head_l))
            subj_group = [head_l]
        else:
            if conj_open and subj_group:
                subj_group.append(head_l)
            else:
                subj_group = [head_l]
        conj_open = False
        pending = ("", "")
        last_head = head_l

    # trailing verb with no object ("a dog running"): the jar's graphs
    # carry intransitive verbs as attributes of the subject — same here
    if pending[0] == "verb":
        for s in subj_group:
            attrs.add((s, pending[1]))
    return frozenset(objects) | frozenset(
        (h, a) for h, a in attrs) | frozenset(rels)


def _f1(cand: Tuples, ref: Tuples) -> float:
    if not cand or not ref:
        return 0.0
    inter = len(cand & ref)
    p = inter / len(cand)
    r = inter / len(ref)
    return 0.0 if p + r == 0 else 2 * p * r / (p + r)


class NativeSpice:
    """Drop-in for metrics.external.Spice when no jar is provisioned."""

    def compute_score(self, gts: Dict, res: Dict
                      ) -> Tuple[float, np.ndarray]:
        keys = list(gts.keys())
        scores = np.zeros(len(keys), dtype=np.float64)
        for j, k in enumerate(keys):
            hyp = res[k][0] if isinstance(res[k], (list, tuple)) else res[k]
            cand = parse_scene_graph(hyp)
            merged: set = set()
            refs: Sequence[str] = gts[k]
            for rcap in refs:
                merged |= parse_scene_graph(rcap)
            scores[j] = _f1(cand, frozenset(merged))
        return float(scores.mean()) if len(keys) else 0.0, scores
