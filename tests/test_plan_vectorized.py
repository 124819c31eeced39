"""Oracle test: the vectorized plan_rank_batch must agree exactly with the
loop transcription of the reference composition (plan_rank_batch_loop),
including the Sinkhorn/Hungarian rank rewrite, the sinkhorn_len truncation
of oversized roles, multi-verb rank merges and verb_list permutation.
"""
import numpy as np
import pytest

# heavyweight (~48s on a 1-core host) — excluded from the smoke tier,
# run via the full matrix: `python -m pytest tests/`
pytestmark = pytest.mark.slow

import jax

from vsrcic_tpu.models.api import ControllableCaptioner
from vsrcic_tpu.models.captioner import CaptionerConfig
from vsrcic_tpu.models.s_ssp import SSPConfig, init_ssp_params
from vsrcic_tpu.models.sinkhorn import SinkhornConfig, init_sinkhorn_params
from vsrcic_tpu.pipelines import CaptionJob, EvalPipeline


@pytest.fixture(scope="module")
def pipe():
    cfg = CaptionerConfig(seq_len=20, vocab_size=50, bos_idx=2,
                          det_feat_size=16, input_encoding_size=16,
                          rnn_size=16, att_size=8)
    captioner = ControllableCaptioner(cfg, key=jax.random.PRNGKey(0),
                                      verb_2_vob_all={})
    ssp_cfg = SSPConfig(hidden_size=32, embed_size=32)
    ssp_params = init_ssp_params(jax.random.PRNGKey(1), ssp_cfg)
    kcfg = SinkhornConfig()
    kparams = init_sinkhorn_params(jax.random.PRNGKey(2), kcfg)
    return EvalPipeline(captioner, ssp_params, ssp_cfg, kparams, kcfg,
                        eos_word=3, beam_size=2)


def rand_jobs(rng, n_jobs, L=10):
    jobs = []
    for _ in range(n_jobs):
        n_verbs = rng.randint(0, 4)
        cv = np.zeros(8)
        if n_verbs:
            cv[:n_verbs] = rng.choice(np.arange(1.0, 8.0), size=n_verbs,
                                      replace=False)
        # dense-ish grids so multi-slot roles (Sinkhorn path), >10-distinct
        # truncation and merge collisions all occur across the fuzz corpus
        V = rng.choice(np.arange(0.0, 8.0), size=(L, 8),
                       p=[0.5] + [0.5 / 7] * 7)
        SR = rng.randint(0, 12, size=(L, 8)).astype(float)
        jobs.append(CaptionJob(
            seqs_vis=rng.rand(L, 2048).astype(np.float32),
            seqs_txt=rng.rand(L, 300).astype(np.float32),
            seqs_pos=rng.rand(L, 4).astype(np.float32),
            seqs_all=rng.rand(L, 4, 16).astype(np.float32),
            control_verb=cv, det_seqs_v=V, det_seqs_sr=SR,
            verb_list=rng.rand(L, 1).astype(np.float32)))
    return jobs


def test_plan_vectorized_matches_loop_fuzz(pipe):
    for seed in range(6):
        rng = np.random.RandomState(seed)
        jobs = rand_jobs(rng, n_jobs=7)
        feats = pipe.stage_job_feats(jobs)
        idx_v, val_v, vl_v = pipe.plan_rank_batch(jobs, sink_feats=feats)
        idx_l, val_l, vl_l = pipe.plan_rank_batch_loop(jobs, sink_feats=feats)
        np.testing.assert_array_equal(val_v, val_l, err_msg=f"seed {seed}")
        np.testing.assert_array_equal(idx_v * val_v, idx_l * val_l,
                                      err_msg=f"seed {seed}")
        np.testing.assert_array_equal(vl_v, vl_l, err_msg=f"seed {seed}")


def test_plan_vectorized_empty_batch(pipe):
    rng = np.random.RandomState(0)
    jobs = rand_jobs(rng, 3)
    for j in jobs:  # no verbs anywhere -> no groups at all
        j.control_verb[:] = 0
    idx, val, vl = pipe.plan_rank_batch(jobs)
    assert not val.any()
    assert (vl == -1.0).all()
    idx_l, val_l, vl_l = pipe.plan_rank_batch_loop(jobs)
    np.testing.assert_array_equal(val, val_l)
    np.testing.assert_array_equal(vl, vl_l)


def test_plan_vectorized_oversized_role(pipe):
    """A role carried by more slots than sinkhorn_len: the rank list is
    truncated to sinkhorn_len by the Hungarian rewrite (ref slices the
    10-row assignment, eval_coco.py:196-199)."""
    rng = np.random.RandomState(42)
    L = 10
    job = CaptionJob(
        seqs_vis=rng.rand(L, 2048).astype(np.float32),
        seqs_txt=rng.rand(L, 300).astype(np.float32),
        seqs_pos=rng.rand(L, 4).astype(np.float32),
        seqs_all=rng.rand(L, 4, 16).astype(np.float32),
        control_verb=np.array([3.0, 0, 0, 0, 0, 0, 0, 0]),
        det_seqs_v=np.full((L, 8), 3.0),
        det_seqs_sr=np.full((L, 8), 2.0),  # 80 slots, all SR 2
        verb_list=rng.rand(L, 1).astype(np.float32))
    feats = pipe.stage_job_feats([job])
    idx_v, val_v, vl_v = pipe.plan_rank_batch([job], sink_feats=feats)
    idx_l, val_l, vl_l = pipe.plan_rank_batch_loop([job], sink_feats=feats)
    np.testing.assert_array_equal(val_v, val_l)
    np.testing.assert_array_equal(idx_v * val_v, idx_l * val_l)
    np.testing.assert_array_equal(vl_v, vl_l)


def test_group_arrays_match_groups():
    """extract_verb_groups_arrays is the CSR mirror of the VerbGroup list."""
    from vsrcic_tpu.pipelines.sr_groups import (extract_verb_groups_arrays,
                                                extract_verb_groups_batch)
    rng = np.random.RandomState(7)
    P, L = 9, 10
    cv = np.zeros((P, 8))
    for p in range(P):
        nv = rng.randint(0, 4)
        if nv:
            cv[p, :nv] = rng.choice(np.arange(1.0, 6.0), nv, replace=False)
    V = rng.choice(np.arange(0.0, 6.0), size=(P, L, 8))
    SR = rng.randint(0, 30, size=(P, L, 8)).astype(float)

    groups, owners = extract_verb_groups_batch(cv, V, SR)
    ga = extract_verb_groups_arrays(cv, V, SR)
    if not groups:
        assert ga is None
        return
    assert list(ga.owners) == owners
    assert list(ga.verbs) == [g.verb for g in groups]
    np.testing.assert_array_equal(ga.det_sr,
                                  np.stack([g.det_sr_seq for g in groups]))
    plen = ga.pair_len
    for q in range(len(ga.pair_group)):
        g = groups[int(ga.pair_group[q])]
        sr = int(ga.pair_sr[q])
        slots = list(ga.slot_flat[ga.pair_off[q]:ga.pair_off[q + 1]])
        assert g.sr_find[sr] == slots
        assert (sr in g.need_re_rank) == (plen[q] > 1)
