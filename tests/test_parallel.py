"""Distributed correctness on the 8-device CPU mesh (conftest forces it).

- sharded beam decode == single-device decode (token-exact)
- data-parallel XE training step == single-device step (loss + params match)
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vsrcic_tpu.models.api import ControllableCaptioner
from vsrcic_tpu.models.captioner import CaptionerConfig, init_captioner_params
from vsrcic_tpu.parallel import (make_mesh, replicate, shard_batch,
                                 sharded_beam_search_v)
from vsrcic_tpu.train import CaptionerXETrainer

# heavyweight (~244s on a 1-core host: GSPMD mesh compiles) — excluded
# from the smoke tier, run via the full matrix: `python -m pytest tests/`
pytestmark = [pytest.mark.skipif(len(jax.devices()) < 8,
                                 reason="needs 8 virtual devices"),
              pytest.mark.slow]

B, L, M, D = 8, 4, 3, 16


def test_sharded_beam_matches_single():
    cfg = CaptionerConfig(seq_len=6, vocab_size=40, bos_idx=2,
                          det_feat_size=D, input_encoding_size=12,
                          rnn_size=10, att_size=8)
    cap = ControllableCaptioner(cfg, key=jax.random.PRNGKey(0),
                                verb_2_vob_all={"1": [5, 6]})
    rng = np.random.RandomState(0)
    dets = rng.rand(B, 6, D).astype(np.float32)
    groups = rng.rand(B, L, M, D).astype(np.float32)
    vl = np.where(rng.rand(B, L) < 0.3, 1, -1).astype(np.int32)

    single = cap.beam_search_v(dets, groups, vl, eos_word=3, beam_size=3)
    mesh = make_mesh(n_data=8)
    sharded = sharded_beam_search_v(cap, mesh, dets, groups, vl,
                                    eos_word=3, beam_size=3)
    np.testing.assert_array_equal(np.asarray(single.words),
                                  np.asarray(sharded.words))
    np.testing.assert_array_equal(np.asarray(single.gates),
                                  np.asarray(sharded.gates))


def test_data_parallel_training_matches_single():
    cfg = CaptionerConfig(seq_len=6, vocab_size=30, bos_idx=2,
                          det_feat_size=D, input_encoding_size=12,
                          rnn_size=10, att_size=8)
    params = init_captioner_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.RandomState(1)
    batch = (rng.rand(B, 5, D).astype(np.float32),
             rng.randint(0, 30, size=(B, 6)).astype(np.int32),
             rng.rand(B, 6, M, D).astype(np.float32),
             rng.randint(0, 2, size=(B, 6)).astype(np.int32))

    tr1 = CaptionerXETrainer(cfg, params, lr=1e-3)
    losses1 = [tr1.step(*batch)[0] for _ in range(3)]

    mesh = make_mesh(n_data=8)
    tr8 = CaptionerXETrainer(cfg, replicate(params, mesh), lr=1e-3,
                             mesh=mesh)
    sb = shard_batch(batch, mesh)
    losses8 = [tr8.step(*sb)[0] for _ in range(3)]

    np.testing.assert_allclose(losses1, losses8, rtol=2e-5)
    # final params equal across the replicated/unsharded runs
    p1 = jax.tree.leaves(tr1.state.params)
    p8 = jax.tree.leaves(tr8.state.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=1e-6)


def test_data_parallel_scst_matches_single():
    """SCST RL step on the 8-device mesh == single-device step: identical
    sampled trajectories (threefry bits are positional under GSPMD), equal
    loss/advantage, equal updated params — incl. a batch NOT divisible by
    the mesh (pad rows carry advantage 0 + exact mean rescale)."""
    from vsrcic_tpu.metrics import Cider
    from vsrcic_tpu.text import TextField
    from vsrcic_tpu.train import CaptionerSCSTTrainer

    tf = TextField(fix_length=6)
    tf.build_vocab([["a", "dog", "runs", "fast"], ["a", "cat", "sits"]],
                   min_freq=1)
    cfg = CaptionerConfig(seq_len=6, vocab_size=len(tf.vocab),
                          bos_idx=tf.bos_idx, det_feat_size=D,
                          input_encoding_size=12, rnn_size=10, att_size=8)
    params = init_captioner_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.RandomState(2)
    b = 6   # NOT divisible by 8
    dets = rng.rand(b, 5, D).astype(np.float32)
    groups = rng.rand(b, 6, M, D).astype(np.float32)
    gts = ["a dog runs fast", "a cat sits", "a dog sits",
           "a cat runs", "a dog runs", "a cat sits fast"]

    tr1 = CaptionerSCSTTrainer(cfg, params, tf, Cider(), lr=1e-3)
    key = jax.random.PRNGKey(7)
    loss1, adv1 = tr1.step(dets, groups, gts, key)

    mesh = make_mesh(n_data=8)
    tr8 = CaptionerSCSTTrainer(cfg, replicate(params, mesh), tf, Cider(),
                               lr=1e-3, mesh=mesh)
    loss8, adv8 = tr8.step(dets, groups, gts, key)

    np.testing.assert_allclose(loss1, loss8, rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(adv1, adv8, rtol=2e-5, atol=1e-7)
    for a, c in zip(jax.tree.leaves(tr1.state.params),
                    jax.tree.leaves(tr8.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=5e-5, atol=1e-6)


def test_data_parallel_scst_fast_decode_runs():
    """mesh + fast_decode: fused decode under shard_map (per-shard PRNG
    streams) — a full RL step runs and updates params; trajectories are not
    required to match the single-device stream."""
    import jax.numpy as jnp
    from vsrcic_tpu.metrics import Cider
    from vsrcic_tpu.text import TextField
    from vsrcic_tpu.train import CaptionerSCSTTrainer

    tf = TextField(fix_length=6)
    tf.build_vocab([["a", "dog", "runs"], ["a", "cat", "sits"]], min_freq=1)
    cfg = CaptionerConfig(seq_len=6, vocab_size=len(tf.vocab),
                          bos_idx=tf.bos_idx, det_feat_size=D,
                          input_encoding_size=12, rnn_size=10, att_size=8)
    params = init_captioner_params(jax.random.PRNGKey(4), cfg)
    rng = np.random.RandomState(4)
    b = 6   # pads to 64 (8 shards x 8-row Pallas tiles)
    dets = rng.rand(b, 5, D).astype(np.float32)
    groups = rng.rand(b, 6, M, D).astype(np.float32)
    gts = ["a dog runs", "a cat sits", "a dog sits",
           "a cat runs", "a dog runs", "a cat sits"]

    mesh = make_mesh(n_data=8)
    tr = CaptionerSCSTTrainer(cfg, replicate(params, mesh), tf, Cider(),
                              lr=1e-3, mesh=mesh, fast_decode=True,
                              pallas_interpret=True)
    p0 = [np.asarray(x).copy() for x in jax.tree.leaves(tr.state.params)]
    loss, adv = tr.step(dets, groups, gts, jax.random.PRNGKey(11))
    assert np.isfinite(loss) and np.isfinite(adv)
    p1 = [np.asarray(x) for x in jax.tree.leaves(tr.state.params)]
    assert any(not np.array_equal(a, c) for a, c in zip(p0, p1))


def test_sharded_candidate_beam_matches_single():
    """The vocab-topk candidate beam ('xla' variant — the Pallas kernel
    doesn't partition under GSPMD) sharded over 8 devices == single-device
    flat beam, token-exact."""
    cfg = CaptionerConfig(seq_len=6, vocab_size=40, bos_idx=2,
                          det_feat_size=D, input_encoding_size=12,
                          rnn_size=10, att_size=8)
    flat = ControllableCaptioner(cfg, key=jax.random.PRNGKey(3),
                                 verb_2_vob_all={"1": [5, 6]})
    cand = ControllableCaptioner(cfg, params=flat.params,
                                 verb_2_vob_all={"1": [5, 6]},
                                 use_vocab_topk="xla")
    rng = np.random.RandomState(3)
    dets = rng.rand(B, 6, D).astype(np.float32)
    groups = rng.rand(B, L, M, D).astype(np.float32)
    vl = np.where(rng.rand(B, L) < 0.3, 1, -1).astype(np.int32)

    single = flat.beam_search_v(dets, groups, vl, eos_word=3, beam_size=3)
    mesh = make_mesh(n_data=8)
    sharded = sharded_beam_search_v(cand, mesh, dets, groups, vl,
                                    eos_word=3, beam_size=3)
    np.testing.assert_array_equal(np.asarray(single.words),
                                  np.asarray(sharded.words))
    np.testing.assert_array_equal(np.asarray(single.gates),
                                  np.asarray(sharded.gates))


def test_sharded_pallas_kernels_under_shard_map():
    """The Pallas fast path (fused group attention + streaming vocab top-k,
    interpret mode on CPU) runs inside shard_map: each shard executes the
    same single-chip kernel program on its local block — token-exact vs the
    single-device call with the identical kernels."""
    cfg = CaptionerConfig(seq_len=6, vocab_size=40, bos_idx=2,
                          det_feat_size=D, input_encoding_size=12,
                          rnn_size=10, att_size=8)
    fast = ControllableCaptioner(cfg, key=jax.random.PRNGKey(5),
                                 verb_2_vob_all={"1": [5, 6]},
                                 use_fused_attention=True,
                                 use_vocab_topk=True, pallas_interpret=True)
    rng = np.random.RandomState(5)
    dets = rng.rand(B, 6, D).astype(np.float32)
    groups = rng.rand(B, L, M, D).astype(np.float32)
    vl = np.where(rng.rand(B, L) < 0.3, 1, -1).astype(np.int32)

    single = fast.beam_search_v(dets, groups, vl, eos_word=3, beam_size=3)
    mesh = make_mesh(n_data=8)
    sharded = sharded_beam_search_v(fast, mesh, dets, groups, vl,
                                    eos_word=3, beam_size=3)
    np.testing.assert_array_equal(np.asarray(single.words),
                                  np.asarray(sharded.words))
    np.testing.assert_array_equal(np.asarray(single.gates),
                                  np.asarray(sharded.gates))


def test_sharded_eval_pipeline_matches_single():
    """EvalPipeline(mesh=...) shards EVERY device phase over the data axis —
    constrained planner generate (group axis), Sinkhorn (ambiguous-pair
    axis), recons build (job axis) and the beam — each padding its
    non-divisible axis; tokens equal the single-device pipeline."""
    from vsrcic_tpu.models.s_ssp import SSPConfig, init_ssp_params
    from vsrcic_tpu.models.sinkhorn import (SinkhornConfig,
                                            init_sinkhorn_params)
    from vsrcic_tpu.pipelines import CaptionJob, EvalPipeline

    cfg = CaptionerConfig(seq_len=8, vocab_size=40, bos_idx=2,
                          det_feat_size=D, input_encoding_size=12,
                          rnn_size=10, att_size=8)
    cap = ControllableCaptioner(cfg, key=jax.random.PRNGKey(9),
                                verb_2_vob_all={"3": [5, 6], "4": [7]})
    ssp_cfg = SSPConfig(hidden_size=32, embed_size=32)
    ssp_params = init_ssp_params(jax.random.PRNGKey(1), ssp_cfg)
    kcfg = SinkhornConfig()
    kparams = init_sinkhorn_params(jax.random.PRNGKey(2), kcfg)

    rng = np.random.RandomState(9)
    L_, M_ = 10, 4
    jobs = []
    for p in range(6):   # NOT divisible by the 8-device mesh -> pad path
        job = CaptionJob(
            seqs_vis=rng.rand(L_, 2048).astype(np.float32),
            seqs_txt=rng.rand(L_, 300).astype(np.float32),
            seqs_pos=rng.rand(L_, 4).astype(np.float32),
            seqs_all=rng.rand(L_, M_, D).astype(np.float32),
            control_verb=np.array([3.0, 0, 0, 0, 0, 0, 0, 0]),
            det_seqs_v=np.zeros((L_, 8)), det_seqs_sr=np.zeros((L_, 8)),
            verb_list=np.full((L_, 1), -1.0))
        job.det_seqs_v[0, 0] = job.det_seqs_v[1, 0] = 3.0
        job.det_seqs_sr[0, 0] = 2.0
        job.det_seqs_sr[1, 0] = 7.0
        if p % 2:
            # ambiguous SR (slots 2,3 share SR 5) -> sharded Sinkhorn +
            # Hungarian; second verb -> rank merge + planner group axis > 1
            job.det_seqs_v[2, 0] = job.det_seqs_v[3, 0] = 3.0
            job.det_seqs_sr[2, 0] = job.det_seqs_sr[3, 0] = 5.0
            job.control_verb[1] = 4.0
            job.det_seqs_v[4, 1] = job.det_seqs_v[5, 1] = 4.0
            job.det_seqs_sr[4, 1] = 1.0
            job.det_seqs_sr[5, 1] = 2.0
        jobs.append(job)
    dets = rng.rand(len(jobs), 6, D).astype(np.float32)

    single = EvalPipeline(cap, ssp_params, ssp_cfg, kparams, kcfg,
                          eos_word=3, beam_size=2)
    words_single = single.run_batch(dets, jobs)

    mesh = make_mesh(n_data=8)
    sharded = EvalPipeline(cap, ssp_params, ssp_cfg, kparams, kcfg,
                           eos_word=3, beam_size=2, mesh=mesh)
    words_sharded = sharded.run_batch(dets, jobs)
    np.testing.assert_array_equal(words_single, np.asarray(words_sharded))


def test_data_parallel_training_matches_single_compact():
    """The PRODUCTION XE wire format (compact int group ids -> the
    rematted per-step scan loss, train/captioner.py _xe_loss_compact)
    sharded over the mesh must match single-device losses and params —
    the dense-ctrl test above covers the other loss path."""
    cfg = CaptionerConfig(seq_len=6, vocab_size=30, bos_idx=2,
                          det_feat_size=D, input_encoding_size=12,
                          rnn_size=10, att_size=8)
    params = init_captioner_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.RandomState(2)
    batch = (rng.rand(B, 5, D).astype(np.float32),
             rng.randint(0, 30, size=(B, 6)).astype(np.int32),
             rng.randint(-1, 5, size=(B, 6, M)).astype(np.int32),
             rng.randint(0, 2, size=(B, 6)).astype(np.int32))

    tr1 = CaptionerXETrainer(cfg, params, lr=1e-3)
    losses1 = [tr1.step(*batch)[0] for _ in range(3)]

    mesh = make_mesh(n_data=8)
    tr8 = CaptionerXETrainer(cfg, replicate(params, mesh), lr=1e-3,
                             mesh=mesh)
    sb = shard_batch(batch, mesh)
    losses8 = [tr8.step(*sb)[0] for _ in range(3)]

    np.testing.assert_allclose(losses1, losses8, rtol=2e-5)
    p1 = jax.tree.leaves(tr1.state.params)
    p8 = jax.tree.leaves(tr8.state.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=1e-6)


def test_data_parallel_planner_trainers_match_single():
    """SSP + Sinkhorn trainers sharded over the mesh == single device,
    including NON-DIVISIBLE batches (group/pair counts are data-dependent,
    so the mesh path pads: SSP with weight-0 rows via row_weights, Sinkhorn
    with all-zero pairs — both exactly value-preserving)."""
    from vsrcic_tpu.models.s_ssp import SSPConfig, init_ssp_params
    from vsrcic_tpu.models.sinkhorn import (SinkhornConfig,
                                            init_sinkhorn_params)
    from vsrcic_tpu.train import SinkhornTrainer, SSPTrainer

    rng = np.random.RandomState(3)
    mesh = make_mesh(n_data=8)

    # --- SSP: 11 groups (not divisible by 8) --------------------------
    cfg = SSPConfig(hidden_size=16, embed_size=16, encoder_layers=1,
                    decoder_layers=1, dropout=0.0)
    params = init_ssp_params(jax.random.PRNGKey(0), cfg)
    G = 11
    verbs = rng.randint(1, 50, size=(G, 1)).astype(np.float64)
    det_sr = rng.randint(0, 5, size=(G, cfg.max_len)).astype(np.float64)
    gt_sr = np.where(rng.rand(G, cfg.max_len) < 0.6,
                     rng.randint(1, 5, (G, cfg.max_len)), 0).astype(float)
    t1 = SSPTrainer(cfg, params, lr=1e-3)
    t8 = SSPTrainer(cfg, replicate(params, mesh), lr=1e-3, mesh=mesh)
    for i in range(3):
        l1 = t1.step(verbs, det_sr, gt_sr, jax.random.PRNGKey(i))
        l8 = t8.step(verbs, det_sr, gt_sr, jax.random.PRNGKey(i))
        # the step-2/3 losses run on step-1/2 params — matching to 2e-5
        # across the trajectory is the equivalence that matters
        np.testing.assert_allclose(l1, l8, rtol=2e-5)
    for a, b in zip(jax.tree.leaves(t1.state.params),
                    jax.tree.leaves(t8.state.params)):
        # Adam's g/sqrt(v) amplifies the shard-psum reassociation noise on
        # near-zero grads into ~1e-2 relative after a few steps (the loss
        # trajectory above is the tight check)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=1e-4)

    # --- Sinkhorn: 13 pairs (not divisible by 8), both normalizations --
    kcfg = SinkhornConfig(n=4, n_iters=5, tau=0.1, txt_dim=6, vis_dim=8,
                          pos_dim=2)
    kparams = init_sinkhorn_params(jax.random.PRNGKey(1), kcfg)
    P_ = 13
    inputs = rng.rand(P_, 4, 16).astype(np.float32)
    tr = rng.rand(P_, 4).astype(np.float32)
    gt = rng.rand(P_, 4).astype(np.float32)
    for norm in ("images", "pairs"):
        k1 = SinkhornTrainer(kcfg, kparams, lr=1e-3,
                             loss_normalization=norm)
        k8 = SinkhornTrainer(kcfg, replicate(kparams, mesh), lr=1e-3,
                             loss_normalization=norm, mesh=mesh)
        for _ in range(2):
            l1 = k1.step(inputs, tr, gt, n_images=4)
            l8 = k8.step(inputs, tr, gt, n_images=4)
            np.testing.assert_allclose(l1, l8, rtol=2e-5)
        for a, b in zip(jax.tree.leaves(k1.state.params),
                        jax.tree.leaves(k8.state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-5, atol=1e-6)
