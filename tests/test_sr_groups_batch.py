"""extract_verb_groups_batch == per-job extract_verb_groups, exactly.

Fuzzes random grids including the reference's truncation quirk (>max_sr
distinct roles), duplicate roles (re-rank sets), multiple/zero verbs, and
Flickr-style 10000-offset float verb codes.
"""
import numpy as np

from vsrcic_tpu.pipelines.sr_groups import (extract_verb_groups,
                                            extract_verb_groups_batch)


def _random_jobs(rng, n_jobs, T=20, K=8):
    cvs, Vs, Ss = [], [], []
    for _ in range(n_jobs):
        n_verbs = rng.randint(0, 4)
        cv = np.zeros(8)
        verbs = []
        for vi in range(n_verbs):
            v = float(rng.randint(1, 6) + 10000 * rng.randint(0, 2))
            cv[vi] = v
            verbs.append(v)
        V = np.zeros((T, K))
        S = np.zeros((T, K))
        for j in range(T):
            for k in range(K):
                if verbs and rng.rand() < 0.35:
                    V[j, k] = verbs[rng.randint(len(verbs))]
                    S[j, k] = float(rng.randint(1, 26))
        cvs.append(cv)
        Vs.append(V)
        Ss.append(S)
    return np.stack(cvs), np.stack(Vs), np.stack(Ss)


def _assert_groups_equal(a, b):
    assert len(a) == len(b)
    for ga, gb in zip(a, b):
        assert ga.verb == gb.verb
        np.testing.assert_array_equal(ga.det_sr_seq, gb.det_sr_seq)
        assert ga.sr_find == gb.sr_find
        assert ga.need_re_rank == gb.need_re_rank


def test_batch_extractor_matches_loop():
    rng = np.random.RandomState(0)
    for trial in range(8):
        cv, V, S = _random_jobs(rng, 16)
        ref_groups, ref_owners = [], []
        for p in range(len(cv)):
            for g in extract_verb_groups(cv[p], V[p], S[p]):
                ref_groups.append(g)
                ref_owners.append(p)
        got_groups, got_owners = extract_verb_groups_batch(cv, V, S)
        assert got_owners == ref_owners
        _assert_groups_equal(ref_groups, got_groups)


def test_batch_extractor_truncation_quirk():
    """>10 distinct SRs: matches after the 10th distinct are dropped
    entirely — even repeats of already-seen SRs."""
    T, K = 20, 8
    cv = np.zeros((1, 8)); cv[0, 0] = 3.0
    V = np.zeros((1, T, K)); S = np.zeros((1, T, K))
    # 12 distinct SRs down column 0, then a repeat of SR 1 at the end
    for j in range(12):
        V[0, j, 0] = 3.0
        S[0, j, 0] = j + 1
    V[0, 15, 0] = 3.0
    S[0, 15, 0] = 1.0      # would re-rank SR 1 — but must be dropped
    ref = extract_verb_groups(cv[0], V[0], S[0])
    got, owners = extract_verb_groups_batch(cv, V, S)
    _assert_groups_equal(ref, got)
    assert got[0].need_re_rank == set()
    assert (got[0].det_sr_seq != 0).sum() == 10


def test_batch_extractor_empty():
    cv = np.zeros((3, 8))
    V = np.zeros((3, 20, 8))
    S = np.zeros((3, 20, 8))
    groups, owners = extract_verb_groups_batch(cv, V, S)
    assert groups == [] and owners == []
