"""Corpus-scale robustness audit for the native SPICE parser.

Round-4 verdict: the parser's closed-class lexicons had only 12 golden
captions as evidence; out-of-lexicon verbs silently parse as nouns. This
script measures parse coverage over the 240-caption robustness corpus
(tests/data/spice_robustness_corpus.txt — realistic COCO/Flickr phrasing:
out-of-lexicon verbs, passives, conjunctions, noun-verb-homograph
compounds) and prints one JSON line; thresholds are pinned in
tests/test_spice_native.py and the numbers recorded in docs/PARITY.md.

    python scripts/spice_coverage.py [--corpus path]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, ".")

DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "data",
    "spice_robustness_corpus.txt")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=DEFAULT)
    ap.add_argument("--show_parses", type=int, default=0,
                    help="print the first N caption -> tuple-set parses")
    args = ap.parse_args()

    from vsrcic_tpu.metrics.spice import parse_coverage, parse_scene_graph

    with open(args.corpus) as f:
        captions = [ln.strip() for ln in f if ln.strip()]
    for cap in captions[: args.show_parses]:
        print(cap, "->", sorted(parse_scene_graph(cap)), file=sys.stderr)
    stats = parse_coverage(captions)
    stats["metric"] = "spice_parse_coverage"
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
