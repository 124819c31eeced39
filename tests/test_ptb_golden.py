"""Differential/golden test for the native PTB tokenizer.

The reference tokenizes GT captions through the Stanford CoreNLP
PTBTokenizer jar with coco-caption's exact invocation
(`-preserveLines -lowerCase`, then drop the PUNCTUATIONS tokens) —
ref coco_scripts/train.py:165-167, eval_coco.py:269-270. SCST rewards and
the metric table depend on this tokenization, so `ptb_tokenize` is pinned
here against transcribed jar outputs for the behaviors that occur in
caption corpora (possessives, n't contractions, quotes, numerals,
ellipses, hyphens, bracket tokens, assimilation splits).

When a Stanford CoreNLP jar is provisioned (VSRCIC_CORENLP_JAR), the same
corpus is ALSO run through the real jar and compared token-for-token
(skipped otherwise — no jars in this environment).

Known divergence (documented, not asserted): sentence-final abbreviations
("the u.s.") — the jar's abbreviation lexicon keeps "u.s." and emits a
separate final ".", the sed-lineage rules here split "u.s ." the classic
PTB way. Mid-sentence abbreviations agree. COCO/Flickr GT captions are
overwhelmingly plain sentences ending in a common noun + "."
"""
import os
import subprocess

import pytest

from vsrcic_tpu.text.tokenizer import ptb_tokenize

# (input caption, jar-pipeline output after PUNCTUATIONS drop)
CORPUS = [
    ("A man, riding a horse.", "a man riding a horse"),
    ("Don't stop me now!", "do n't stop me now"),
    ("The dog's bone is new.", "the dog 's bone is new"),
    ("It's a sunny day.", "it 's a sunny day"),
    ("The dogs' toys are red.", "the dogs toys are red"),
    ('He said "hello" to me.', "he said hello to me"),
    ('"A dog."', "a dog"),
    # the kept-bracket quirk: -lowerCase emits "-lrb-", the uppercase
    # "-LRB-" membership test misses it, so bracket tokens SURVIVE
    ("A large (red) ball.", "a large -lrb- red -rrb- ball"),
    ("Over 1,000 people marched.", "over 1,000 people marched"),
    ("Wait... what?", "wait what"),
    ("A well-lit room.", "a well-lit room"),
    ("I cannot see it.", "i can not see it"),
    ("We're gonna win.", "we 're gon na win"),
    ("a dog ; a cat", "a dog a cat"),
    ("The U.S. flag waves", "the u.s. flag waves"),
    ("dinner at 5:30 pm", "dinner at 5:30 pm"),
    ("note: closed today", "note closed today"),
    ("He won't go there.", "he wo n't go there"),
    ("They've been here.", "they 've been here"),
    ("I'll do it; she'd agree.", "i 'll do it she 'd agree"),
    ("50% off sale", "50 % off sale"),
    ("emails @ work", "emails @ work"),
    ("a black & white cat", "a black & white cat"),
    ("two men -- one hat", "two men one hat"),
]


def test_ptb_tokenize_matches_transcribed_jar_outputs():
    got = ptb_tokenize([c for c, _ in CORPUS])
    for (inp, want), out in zip(CORPUS, got):
        assert out == want, "%r -> %r, want %r" % (inp, out, want)


def test_ptb_tokenize_generated_caption_identity():
    """Generated captions (lowercase vocab words, no punctuation) must pass
    through untouched — SCST reward parity for the sampled side."""
    caps = ["a man riding a horse", "two dogs run on grass"]
    assert ptb_tokenize(caps) == caps


@pytest.mark.skipif(not os.environ.get("VSRCIC_CORENLP_JAR"),
                    reason="Stanford CoreNLP jar not provisioned")
def test_ptb_tokenize_vs_real_jar():
    """Full differential vs the actual jar, coco-caption invocation."""
    from vsrcic_tpu.text.tokenizer import PUNCTUATIONS
    jar = os.environ["VSRCIC_CORENLP_JAR"]
    text = "\n".join(c for c, _ in CORPUS)
    p = subprocess.run(
        ["java", "-cp", jar, "edu.stanford.nlp.process.PTBTokenizer",
         "-preserveLines", "-lowerCase"],
        input=text, capture_output=True, text=True, check=True)
    jar_lines = [
        " ".join(w for w in line.rstrip().split(" ")
                 if w not in PUNCTUATIONS)
        for line in p.stdout.split("\n")[:len(CORPUS)]]
    ours = ptb_tokenize([c for c, _ in CORPUS])
    assert ours == jar_lines
