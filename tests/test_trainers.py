"""Trainers: loss decreases on synthetic batches; SCST runs end-to-end."""
import numpy as np
import pytest

# heavyweight (~147s on a 1-core host) — excluded from the smoke tier,
# run via the full matrix: `python -m pytest tests/`
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from vsrcic_tpu.models.captioner import CaptionerConfig, init_captioner_params
from vsrcic_tpu.models.s_ssp import SSPConfig, init_ssp_params
from vsrcic_tpu.models.sinkhorn import SinkhornConfig, init_sinkhorn_params
from vsrcic_tpu.train import (
    CaptionerSCSTTrainer, CaptionerXETrainer, SSPTrainer, SinkhornTrainer,
    planner_lr, step_lr, sinkhorn_pairs_from_grids)
from vsrcic_tpu.metrics import Cider
from vsrcic_tpu.text import TextField

V, D, E, R, A, T, B, M = 30, 16, 12, 10, 8, 8, 4, 3


@pytest.fixture(scope="module")
def cfg():
    return CaptionerConfig(seq_len=T, vocab_size=V, bos_idx=2,
                           det_feat_size=D, input_encoding_size=E,
                           rnn_size=R, att_size=A)


def make_xe_batch(seed=0):
    rng = np.random.RandomState(seed)
    detections = rng.rand(B, 6, D).astype(np.float32)
    captions = rng.randint(0, V, size=(B, T))
    ctrl = rng.rand(B, T, M, D).astype(np.float32)
    gates = rng.randint(0, 2, size=(B, T))
    gates[:, -2:] = -1
    return detections, captions, ctrl, gates


def test_xe_loss_decreases(cfg):
    params = init_captioner_params(jax.random.PRNGKey(0), cfg)
    tr = CaptionerXETrainer(cfg, params, lr=1e-3)
    batch = make_xe_batch()
    losses = [tr.step(*batch)[0] for _ in range(8)]
    assert losses[-1] < losses[0]


def test_step_lr_schedule():
    assert step_lr(1.0, 0) == 1.0
    assert step_lr(1.0, 3) == pytest.approx(0.8)
    assert planner_lr(1.0, 2) == 1.0
    assert planner_lr(1.0, 3) == pytest.approx(0.6)
    assert planner_lr(1.0, 6) == pytest.approx(0.36)


def test_scst_step_runs(cfg):
    params = init_captioner_params(jax.random.PRNGKey(1), cfg)
    tf = TextField(fix_length=T)
    caps = ["a b c d", "c d e f", "a c e g", "b d f h"]
    tf.build_vocab(caps, min_freq=1)
    cfg2 = CaptionerConfig(**{**cfg.__dict__, "vocab_size": len(tf.vocab),
                              "bos_idx": tf.bos_idx})
    params = init_captioner_params(jax.random.PRNGKey(1), cfg2)
    cider = Cider(gts={i: [c] for i, c in enumerate(caps)})
    tr = CaptionerSCSTTrainer(cfg2, params, tf, cider, lr=1e-4)
    rng = np.random.RandomState(0)
    detections = rng.rand(B, 6, D).astype(np.float32)
    groups = rng.rand(B, 4, M, D).astype(np.float32)
    loss, adv = tr.step(detections, groups, caps, jax.random.PRNGKey(0))
    assert np.isfinite(loss)


def test_ssp_trainer_decreases():
    scfg = SSPConfig(hidden_size=32, embed_size=32)
    params = init_ssp_params(jax.random.PRNGKey(0), scfg)
    tr = SSPTrainer(scfg, params, lr=1e-3)
    rng = np.random.RandomState(0)
    verbs = rng.randint(1, 100, size=(6, 1))
    det_sr = np.zeros((6, 10), np.int64)
    det_sr[:, :3] = rng.randint(1, 26, size=(6, 3))
    losses = [tr.step(verbs, det_sr, det_sr, jax.random.PRNGKey(i))
              for i in range(6)]
    assert losses[-1] < losses[0]


def test_ssp_batch_from_grids():
    cv = [[np.array([3.0, 0, 0, 0, 0, 0, 0, 0])]]
    v = [[np.zeros((10, 8))]]
    sr = [[np.zeros((10, 8))]]
    v[0][0][0, 0] = 3.0
    v[0][0][1, 0] = 3.0
    sr[0][0][0, 0] = 1.0
    sr[0][0][1, 0] = 2.0
    batch = SSPTrainer.batch_from_grids(cv, v, sr, v, sr)
    verbs, det, gt = batch
    assert verbs.shape == (1, 1)
    assert det[0][0] == 1.0 and det[0][1] == 2.0


def test_sinkhorn_trainer():
    kcfg = SinkhornConfig()
    params = init_sinkhorn_params(jax.random.PRNGKey(0), kcfg)
    tr = SinkhornTrainer(kcfg, params, lr=1e-3)
    rng = np.random.RandomState(0)
    # two slots share one SR -> one re-rank pair
    cv = [[np.array([2.0, 0, 0, 0, 0, 0, 0, 0])]]
    v = [[np.zeros((10, 8))]]
    sr = [[np.zeros((10, 8))]]
    v[0][0][0, 0] = 2.0
    v[0][0][1, 0] = 2.0
    sr[0][0][0, 0] = 5.0
    sr[0][0][1, 0] = 5.0
    il = [[np.array([[1.0], [0.0]] + [[-1.0]] * 8)]]
    vis = [[rng.rand(10, 2048).astype(np.float32)]]
    txt = [[rng.rand(10, 300).astype(np.float32)]]
    pos = [[rng.rand(10, 4).astype(np.float32)]]
    pairs = sinkhorn_pairs_from_grids(cv, v, sr, il, vis, txt, pos)
    assert pairs is not None
    inputs, tr_locs, gt_locs = pairs
    assert inputs.shape == (1, 10, 2352)
    assert tr_locs[0][0] == 0.0 and tr_locs[0][1] == 1.0
    losses = [tr.step(inputs, tr_locs, gt_locs, n_images=1)
              for _ in range(5)]
    assert losses[-1] < losses[0]


def test_compact_control_equivalence(cfg):
    """Compact int-id control path == dense feature path, bit for bit."""
    from vsrcic_tpu.decode.loops import (expand_compact_groups,
                                         forward_teacher_forcing)
    rng = np.random.RandomState(0)
    detections = rng.rand(B, 10, D).astype(np.float32)
    captions = rng.randint(0, V, size=(B, T))
    ids = rng.randint(-1, 10, size=(B, T, M)).astype(np.int32)
    dense = np.zeros((B, T, M, D), np.float32)
    for b in range(B):
        for t in range(T):
            for m in range(M):
                if ids[b, t, m] >= 0:
                    dense[b, t, m] = detections[b, ids[b, t, m]]
    expanded = np.asarray(expand_compact_groups(jnp.asarray(detections),
                                                jnp.asarray(ids)))
    np.testing.assert_array_equal(expanded, dense)

    params = init_captioner_params(jax.random.PRNGKey(0), cfg)
    out_d, gate_d = forward_teacher_forcing(
        params, cfg, jnp.asarray(detections), jnp.asarray(captions),
        jnp.asarray(dense))
    from vsrcic_tpu.decode.loops import forward_teacher_forcing_compact
    out_c, gate_c = forward_teacher_forcing_compact(
        params, cfg, jnp.asarray(detections), jnp.asarray(captions),
        jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_d),
                               rtol=1e-6)


def test_compact_field_matches_dense(tmp_path):
    """COCOControlSequenceField(compact) ids expand to the dense tensors."""
    from vsrcic_tpu.data import (COCOControlSequenceField, SyntheticCOCO)
    syn = SyntheticCOCO(n_images=4, n_val=1, n_test=1, feat_dim=32)
    dense_f = COCOControlSequenceField(
        syn.store, classes_path=syn.classes, padding_idx=-1, all_boxes=False,
        fix_length=20)
    compact_f = COCOControlSequenceField(
        syn.store, classes_path=syn.classes, padding_idx=-1, all_boxes=False,
        fix_length=20, compact=True)
    train, _, _ = syn.sample_splits
    ex = train[0]
    x = (ex.detection[0], ex.detection[1])
    dense = dense_f.preprocess(x)
    comp = compact_f.preprocess(x)
    feats = syn.store.get(
        int(ex.image.split("_")[-1].split(".")[0])).features
    for d_out, c_ids in ((dense[0], comp[0]), (dense[2], comp[2])):
        got = np.where((c_ids >= 0)[..., None],
                       feats[np.clip(c_ids, 0, len(feats) - 1)], 0.0)
        np.testing.assert_allclose(got, d_out, rtol=1e-6)
    np.testing.assert_array_equal(dense[1], comp[1])


def test_compact_field_respects_image_budget():
    """ids never reach the companion image field's max_detections budget
    (VERDICT weak #7: the budget used to be hardcoded at 100)."""
    from vsrcic_tpu.data import COCOControlSequenceField, SyntheticCOCO
    syn = SyntheticCOCO(n_images=4, n_val=1, n_test=1, feat_dim=32)
    budget = 3  # far below the synthetic store's detection count
    compact_f = COCOControlSequenceField(
        syn.store, classes_path=syn.classes, padding_idx=-1, all_boxes=False,
        fix_length=20, compact=True, image_max_detections=budget)
    train, _, _ = syn.sample_splits
    ex = train[0]
    comp = compact_f.preprocess((ex.detection[0], ex.detection[1]))
    for ids in (comp[0], comp[2]):
        assert ids.max() < budget
        assert (ids >= -1).all()


def test_scst_epoch_baseline_mode(cfg):
    """Reference baseline scheme (ref train.py:122-138): frozen epoch-start
    greedy captions; equivalent advantage when params haven't changed."""
    tf = TextField(fix_length=T)
    caps = ["a b c d", "c d e f", "a c e g", "b d f h"]
    tf.build_vocab(caps, min_freq=1)
    cfg2 = CaptionerConfig(**{**cfg.__dict__, "vocab_size": len(tf.vocab),
                              "bos_idx": tf.bos_idx})
    params = init_captioner_params(jax.random.PRNGKey(1), cfg2)
    cider = Cider(gts={i: [c] for i, c in enumerate(caps)})
    rng = np.random.RandomState(0)
    detections = rng.rand(B, 6, D).astype(np.float32)
    groups = rng.rand(B, 4, M, D).astype(np.float32)

    tr_e = CaptionerSCSTTrainer(cfg2, params, tf, cider, lr=1e-4,
                                baseline="epoch")
    base = tr_e.epoch_baseline_caps(detections, groups)
    assert len(base) == B and all(isinstance(c, str) for c in base)
    # epoch mode requires the snapshot
    import pytest
    with pytest.raises(ValueError):
        tr_e.step(detections, groups, caps, jax.random.PRNGKey(0))
    loss_e, adv_e = tr_e.step(detections, groups, caps,
                              jax.random.PRNGKey(0), baseline_caps=base)

    # at step 0 (identical params) the fused step-mode greedy baseline
    # produces the same captions, hence the same advantage and loss
    tr_s = CaptionerSCSTTrainer(cfg2, params, tf, cider, lr=1e-4)
    loss_s, adv_s = tr_s.step(detections, groups, caps,
                              jax.random.PRNGKey(0))
    assert adv_e == adv_s
    np.testing.assert_allclose(loss_e, loss_s, rtol=1e-6)


def test_scst_fast_decode_runs(cfg):
    """SCST with fast_decode (fused attention interpret + fused/hoisted step
    weights): step runs, finite loss; sampled trajectories come from the
    same distribution family (gradient logprobs stay on the strict path)."""
    import jax.numpy as jnp
    from vsrcic_tpu.metrics import Cider
    from vsrcic_tpu.text import TextField, ptb_tokenize
    from vsrcic_tpu.train.captioner import CaptionerSCSTTrainer

    rng = np.random.RandomState(0)
    caps = ["a b c d", "b c a e", "c d e a", "a e b d"]
    tf2 = TextField(fix_length=6)
    tf2.build_vocab(caps, min_freq=1)
    cider = Cider(gts=ptb_tokenize({i: [c] for i, c in enumerate(caps)}))
    cfg2 = CaptionerConfig(seq_len=6, vocab_size=len(tf2.vocab),
                           bos_idx=tf2.bos_idx,
                           det_feat_size=cfg.det_feat_size,
                           input_encoding_size=cfg.input_encoding_size,
                           rnn_size=cfg.rnn_size, att_size=cfg.att_size)
    params = init_captioner_params(jax.random.PRNGKey(0), cfg2)
    tr = CaptionerSCSTTrainer(cfg2, params, tf2, cider, lr=1e-4,
                              fast_decode=True, pallas_interpret=True)
    dets = rng.rand(4, 5, cfg.det_feat_size).astype(np.float32)
    groups = rng.rand(4, 3, 4, cfg.det_feat_size).astype(np.float32)
    loss, adv = tr.step(dets, groups, caps, jax.random.PRNGKey(1))
    assert np.isfinite(loss) and np.isfinite(adv)


def test_xe_compact_lean_matches_dense(cfg):
    """The memory-lean compact XE loss (per-step expansion under
    jax.checkpoint, in-scan NLL reduction) must match the dense path in
    loss AND gradients — it exists only to cut residual memory
    (batch-1024 OOM, docs/ENGINEERING_NOTES), never to change values."""
    from vsrcic_tpu.train.captioner import xe_loss_fn

    rng = np.random.RandomState(3)
    detections = rng.rand(B, 6, D).astype(np.float32)
    captions = rng.randint(0, V, size=(B, T))
    ids = rng.randint(-1, 6, size=(B, T, M)).astype(np.int32)
    gates = rng.randint(0, 2, size=(B, T))
    gates[:, -2:] = -1
    dense = np.zeros((B, T, M, D), np.float32)
    for b in range(B):
        for t in range(T):
            for m in range(M):
                if ids[b, t, m] >= 0:
                    dense[b, t, m] = detections[b, ids[b, t, m]]

    params = init_captioner_params(jax.random.PRNGKey(5), cfg)

    def loss_of(ctrl):
        def f(p):
            loss, aux = xe_loss_fn(p, cfg, jnp.asarray(detections),
                                   jnp.asarray(captions).astype(jnp.int32),
                                   ctrl, jnp.asarray(gates).astype(jnp.int32))
            return loss, aux
        (loss, (lc, lg)), grads = jax.value_and_grad(f, has_aux=True)(params)
        return loss, lc, lg, grads

    loss_d, lc_d, lg_d, g_d = loss_of(jnp.asarray(dense))
    loss_c, lc_c, lg_c, g_c = loss_of(jnp.asarray(ids))
    np.testing.assert_allclose(float(loss_c), float(loss_d), rtol=1e-6)
    np.testing.assert_allclose(float(lc_c), float(lc_d), rtol=1e-6)
    np.testing.assert_allclose(float(lg_c), float(lg_d), rtol=1e-6)
    bykey = lambda kv: str(kv[0])
    for (kd, vd), (kc, vc) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(g_d), key=bykey),
            sorted(jax.tree_util.tree_leaves_with_path(g_c), key=bykey)):
        np.testing.assert_allclose(np.asarray(vc), np.asarray(vd),
                                   rtol=2e-5, atol=1e-7, err_msg=str(kd))


def test_forced_logprobs_remat_identical(cfg):
    """remat=True must not change the forced_feedback_logprobs loss value;
    gradients match to float32 ULP (the recomputed backward compiles into
    different fusions, so last-bit reassociation noise is expected)."""
    from vsrcic_tpu.train.captioner import scst_loss_fn

    rng = np.random.RandomState(4)
    detections = rng.rand(B, 6, D).astype(np.float32)
    groups = rng.rand(B, T, M, D).astype(np.float32)
    words = jnp.asarray(rng.randint(0, V, size=(B, T)).astype(np.int32))
    gates = jnp.asarray(rng.randint(0, 2, size=(B, T)).astype(np.int32))
    adv = jnp.asarray(rng.randn(B).astype(np.float32))
    params = init_captioner_params(jax.random.PRNGKey(6), cfg)

    outs = {}
    for remat in (False, True):
        loss, grads = jax.value_and_grad(scst_loss_fn)(
            params, cfg, jnp.asarray(detections), jnp.asarray(groups),
            words, gates, adv, remat=remat)
        outs[remat] = (float(loss), grads)
    assert outs[False][0] == outs[True][0]
    bykey = lambda kv: str(kv[0])
    for (kd, vd), (kc, vc) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(outs[False][1]), key=bykey),
            sorted(jax.tree_util.tree_leaves_with_path(outs[True][1]), key=bykey)):
        np.testing.assert_allclose(np.asarray(vc), np.asarray(vd),
                                   rtol=1e-4, atol=1e-9, err_msg=str(kd))
