"""Golden BLEU/ROUGE tests vs independent transcriptions of the
pycocoevalcap scorers (the algorithms speaksee ports; reference usage:
train.py:207-210, eval_coco.py:272-284). Same pattern as
tests/test_cider_golden.py — oracles written in the upstream code shape,
structure-independent of vsrcic_tpu/metrics/."""
from collections import defaultdict

import numpy as np

from vsrcic_tpu.metrics import Bleu, Rouge


# ---------------------------------------------------------------------------
# Oracle: pycocoevalcap bleu/bleu_scorer.py (eff="closest", corpus totals)
# ---------------------------------------------------------------------------

def _precook(s, n=4):
    words = s.split()
    counts = defaultdict(int)
    for k in range(1, n + 1):
        for i in range(len(words) - k + 1):
            counts[tuple(words[i:i + k])] += 1
    return len(words), counts


def _cook_refs(refs, n=4):
    reflen = []
    maxcounts = {}
    for ref in refs:
        rl, counts = _precook(ref, n)
        reflen.append(rl)
        for (ngram, count) in counts.items():
            maxcounts[ngram] = max(maxcounts.get(ngram, 0), count)
    return reflen, maxcounts


def _cook_test(test, reflen_maxcounts, n=4):
    reflen, refmaxcounts = reflen_maxcounts
    testlen, counts = _precook(test, n)
    result = {"testlen": testlen}
    # eff="closest"
    result["reflen"] = min((abs(l - testlen), l) for l in reflen)[1]
    result["guess"] = [max(0, testlen - k + 1) for k in range(1, n + 1)]
    result["correct"] = [0] * n
    for (ngram, count) in counts.items():
        result["correct"][len(ngram) - 1] += min(
            refmaxcounts.get(ngram, 0), count)
    return result


def oracle_bleu(gts, res, n=4):
    small = 1e-9
    tiny = 1e-15
    totalcomps = {"testlen": 0, "reflen": 0, "guess": [0] * n,
                  "correct": [0] * n}
    bleu_list = [[] for _ in range(n)]
    for key in gts:
        comps = _cook_test(res[key][0], _cook_refs(gts[key], n), n)
        testlen = comps["testlen"]
        reflen = comps["reflen"]
        totalcomps["testlen"] += testlen
        totalcomps["reflen"] += reflen
        for k in range(n):
            totalcomps["guess"][k] += comps["guess"][k]
            totalcomps["correct"][k] += comps["correct"][k]
        bleu = 1.0
        for k in range(n):
            bleu *= ((float(comps["correct"][k]) + tiny)
                     / (float(comps["guess"][k]) + small))
            bleu_list[k].append(bleu ** (1.0 / (k + 1)))
        ratio = (testlen + tiny) / (reflen + small)
        if ratio < 1:
            for k in range(n):
                bleu_list[k][-1] *= np.exp(1 - 1 / ratio)
    bleus = []
    bleu = 1.0
    for k in range(n):
        bleu *= ((float(totalcomps["correct"][k]) + tiny)
                 / (float(totalcomps["guess"][k]) + small))
        bleus.append(bleu ** (1.0 / (k + 1)))
    ratio = (totalcomps["testlen"] + tiny) / (totalcomps["reflen"] + small)
    if ratio < 1:
        for k in range(n):
            bleus[k] *= np.exp(1 - 1 / ratio)
    return bleus, bleu_list


# ---------------------------------------------------------------------------
# Oracle: pycocoevalcap rouge/rouge.py
# ---------------------------------------------------------------------------

def _my_lcs(string, sub):
    if len(string) < len(sub):
        sub, string = string, sub
    lengths = [[0 for _ in range(len(sub) + 1)]
               for _ in range(len(string) + 1)]
    for j in range(1, len(sub) + 1):
        for i in range(1, len(string) + 1):
            if string[i - 1] == sub[j - 1]:
                lengths[i][j] = lengths[i - 1][j - 1] + 1
            else:
                lengths[i][j] = max(lengths[i - 1][j], lengths[i][j - 1])
    return lengths[len(string)][len(sub)]


def oracle_rouge(gts, res, beta=1.2):
    scores = []
    for key in gts:
        candidate = res[key][0].split()
        prec, rec = [], []
        for reference in gts[key]:
            token_r = reference.split()
            lcs = _my_lcs(token_r, candidate)
            prec.append(lcs / float(len(candidate)))
            rec.append(lcs / float(len(token_r)))
        prec_max = max(prec)
        rec_max = max(rec)
        if prec_max != 0 and rec_max != 0:
            score = (((1 + beta ** 2) * prec_max * rec_max)
                     / float(rec_max + beta ** 2 * prec_max))
        else:
            score = 0.0
        scores.append(score)
    return np.mean(scores), np.array(scores)


WORDS = ("a the man dog park ball red big runs sits holds throws on in "
         "with near young old happy").split()


def _corpus(n_images=50, seed=0):
    rng = np.random.RandomState(seed)
    gts, res = {}, {}
    for i in range(n_images):
        refs = [" ".join(rng.choice(WORDS, int(rng.randint(4, 12))))
                for _ in range(int(rng.randint(2, 5)))]
        gts[i] = refs
        base = refs[int(rng.randint(len(refs)))].split()
        if rng.rand() < 0.5:
            base[int(rng.randint(len(base)))] = str(rng.choice(WORDS))
        if rng.rand() < 0.3:
            base = base[:-1] or base  # shorter hyp -> brevity penalty active
        res[i] = [" ".join(base)]
    return gts, res


def test_bleu_matches_pycocoevalcap_oracle():
    gts, res = _corpus(50)
    o_scores, o_per_image = oracle_bleu(gts, res)
    scores, per_image = Bleu(4).compute_score(gts, res)
    np.testing.assert_allclose(scores, o_scores, rtol=1e-12)
    for k in range(4):
        np.testing.assert_allclose(per_image[k], o_per_image[k], rtol=1e-12)
    assert scores[0] > 0.5  # perturbed copies -> high BLEU-1; sanity


def test_rouge_matches_pycocoevalcap_oracle():
    gts, res = _corpus(50, seed=3)
    o_mean, o_scores = oracle_rouge(gts, res)
    mean, scores = Rouge().compute_score(gts, res)
    np.testing.assert_allclose(scores, o_scores, rtol=1e-12)
    np.testing.assert_allclose(mean, o_mean, rtol=1e-12)
