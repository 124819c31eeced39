"""Fused gather+attention Pallas kernel vs the XLA reference math
(interpret mode — compiled-TPU equality is covered by the on-device check
recorded in docs/ENGINEERING_NOTES.md)."""
import numpy as np
import pytest

# heavyweight (~79s on a 1-core host) — excluded from the smoke tier,
# run via the full matrix: `python -m pytest tests/`
pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from vsrcic_tpu.ops.fused_attention import make_fused_group_attention

B, L, M, D, A, K = 3, 4, 8, 32, 16, 2
ROWS = B * K


def _xla_reference(det_groups, groups_proj, item, ctrl, ha, sent_w,
                   sent_mask, fc_sent, att_a):
    det = det_groups[item, ctrl]
    proj = groups_proj[item, ctrl]
    mask = (det.sum(-1) != 0).astype(np.float32)
    det_w = np.tanh(proj + ha[:, None, :]) @ att_a
    logits = np.concatenate([sent_w, det_w], 1)
    e = np.exp(logits - logits.max(1, keepdims=True))
    att = e / e.sum(1, keepdims=True)
    att = att * np.concatenate([sent_mask, mask], 1)
    att = att / att.sum(1, keepdims=True)
    out = att[:, :1] * fc_sent + np.einsum("rm,rmd->rd", att[:, 1:], det)
    return out, (mask * det_w).sum(1, keepdims=True)


@pytest.mark.parametrize("rpb", [2, ROWS])  # multi-block and single-block
def test_fused_attention_matches_xla_math(rpb):
    rng = np.random.RandomState(0)
    det_groups = rng.rand(B, L, M, D).astype(np.float32)
    det_groups[:, :, 5:] = 0.0  # padded regions
    groups_proj = rng.randn(B, L, M, A).astype(np.float32)
    item = (np.arange(ROWS) // K).astype(np.int32)
    ctrl = rng.randint(0, L, ROWS).astype(np.int32)
    ha = rng.randn(ROWS, A).astype(np.float32)
    sent_w = rng.randn(ROWS, 1).astype(np.float32)
    sent_mask = np.ones((ROWS, 1), np.float32)
    fc_sent = rng.randn(ROWS, D).astype(np.float32)
    att_a = rng.randn(A).astype(np.float32)

    want_att, want_gsum = _xla_reference(
        det_groups, groups_proj, item, ctrl, ha, sent_w, sent_mask, fc_sent,
        att_a)

    fn = make_fused_group_attention(B, L, M, D, A, ROWS, rows_per_block=rpb,
                                    interpret=True)
    got_att, got_gsum = fn(jnp.asarray(item), jnp.asarray(ctrl),
                           jnp.asarray(ha), jnp.asarray(sent_w),
                           jnp.asarray(sent_mask), jnp.asarray(fc_sent),
                           jnp.asarray(att_a), jnp.asarray(det_groups),
                           jnp.asarray(groups_proj))
    np.testing.assert_allclose(np.asarray(got_att), want_att,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_gsum), want_gsum,
                               rtol=1e-5, atol=1e-5)


def test_fused_attention_beam_equivalence_interpret():
    """Full beam_search_v with the fused kernel == the XLA gather path."""
    from vsrcic_tpu.models.api import ControllableCaptioner
    from vsrcic_tpu.models.captioner import CaptionerConfig

    cfg = CaptionerConfig(seq_len=6, vocab_size=40, bos_idx=2,
                          det_feat_size=D, input_encoding_size=12,
                          rnn_size=10, att_size=A)
    tbl = {"1": [5, 6]}
    capA = ControllableCaptioner(cfg, key=jax.random.PRNGKey(0),
                                 verb_2_vob_all=tbl)
    # pallas_interpret builds interpret-mode kernels (CPU) AND keeps the
    # fused path active for non-8-multiple row counts (the TPU-only
    # alignment guard would otherwise silently fall back to the XLA step,
    # turning this test into XLA == XLA)
    capB = ControllableCaptioner(cfg, params=capA.params, verb_2_vob_all=tbl,
                                 use_fused_attention=True,
                                 pallas_interpret=True)

    rng = np.random.RandomState(1)
    dets = jnp.asarray(rng.rand(B, 6, D).astype(np.float32))
    groups = jnp.asarray(rng.rand(B, L, M, D).astype(np.float32))
    vl = jnp.asarray(np.where(rng.rand(B, L) < 0.3,
                              1, -1).astype(np.int32))
    ra = capA.beam_search_v(dets, groups, vl, eos_word=3, beam_size=K)
    rb = capB.beam_search_v(dets, groups, vl, eos_word=3, beam_size=K)
    np.testing.assert_array_equal(np.asarray(ra.words), np.asarray(rb.words))
    np.testing.assert_array_equal(np.asarray(ra.gates), np.asarray(rb.gates))


def test_fused_step_weights_equivalence():
    """derive_fused_step_weights reproduces the separate projections."""
    from vsrcic_tpu.models.captioner import (
        CaptionerConfig, _fused_input1_block, derive_fused_step_weights,
        init_captioner_params)
    from vsrcic_tpu.core import nn as cnn
    cfg = CaptionerConfig(seq_len=4, vocab_size=20, bos_idx=2,
                          det_feat_size=16, input_encoding_size=8,
                          rnn_size=6, att_size=4)
    params = init_captioner_params(jax.random.PRNGKey(0), cfg)
    fw = derive_fused_step_weights(params)
    rng = np.random.RandomState(0)
    in1 = cfg.det_feat_size + cfg.rnn_size + cfg.input_encoding_size
    x = jnp.asarray(rng.randn(5, in1).astype(np.float32))
    h = jnp.asarray(rng.randn(5, cfg.rnn_size).astype(np.float32))
    c = jnp.asarray(rng.randn(5, cfg.rnn_size).astype(np.float32))
    s_gate, g_pre_x, h1, c1 = _fused_input1_block(fw, x, h, c, cfg.rnn_size)

    want_s = jax.nn.sigmoid(cnn.linear(params["W1_is"], x)
                            + cnn.linear(params["W1_hs"], h))
    want_gx = cnn.linear(params["W1_ig"], x)
    want_h1, want_c1 = cnn.lstm_cell(params["lstm_cell_1"], x, (h, c))
    np.testing.assert_allclose(np.asarray(s_gate), np.asarray(want_s),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_pre_x), np.asarray(want_gx),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(want_h1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(want_c1),
                               rtol=1e-5, atol=1e-6)


def test_wh_pad6_bit_exact(monkeypatch):
    """VSRCIC_WH_PAD6 (6R zero-padded h-side matmul, one full-width add)
    is BIT-exact vs the 5R slice-add form: the pad block contributes
    h1 @ 0 + 0 = +0.0. Covers f32 and the bf16-weight fast path."""
    from vsrcic_tpu.models.captioner import (
        CaptionerConfig, _fused_input1_block, derive_fused_step_weights,
        init_captioner_params)
    cfg = CaptionerConfig(seq_len=4, vocab_size=20, bos_idx=2,
                          det_feat_size=16, input_encoding_size=8,
                          rnn_size=6, att_size=4)
    params = init_captioner_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.RandomState(1)
    in1 = cfg.det_feat_size + cfg.rnn_size + cfg.input_encoding_size
    x = jnp.asarray(rng.randn(5, in1).astype(np.float32))
    h = jnp.asarray(rng.randn(5, cfg.rnn_size).astype(np.float32))
    c = jnp.asarray(rng.randn(5, cfg.rnn_size).astype(np.float32))
    for dtype in (None, jnp.bfloat16):
        monkeypatch.delenv("VSRCIC_WH_PAD6", raising=False)
        fw = derive_fused_step_weights(params, dtype=dtype)
        base = _fused_input1_block(fw, x, h, c, cfg.rnn_size)
        monkeypatch.setenv("VSRCIC_WH_PAD6", "1")
        fw6 = derive_fused_step_weights(params, dtype=dtype)
        assert fw6["wh"].shape[0] == 6 * cfg.rnn_size
        pad = _fused_input1_block(fw6, x, h, c, cfg.rnn_size)
        for a, b in zip(base, pad):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_greedy_sample_fast_path_matches_plain():
    """The greedy/sample feedback decodes through the fast path (fused
    attention interpret + fused step weights + hoisted img projection) match
    the plain XLA path's tokens; logits math is identical up to matmul
    reassociation."""
    from vsrcic_tpu.models.api import ControllableCaptioner
    from vsrcic_tpu.models.captioner import CaptionerConfig

    cfg = CaptionerConfig(seq_len=6, vocab_size=40, bos_idx=2,
                          det_feat_size=32, input_encoding_size=12,
                          rnn_size=10, att_size=8)
    plain = ControllableCaptioner(cfg, key=jax.random.PRNGKey(7),
                                  verb_2_vob_all={"1": [5, 6]})
    fast = ControllableCaptioner(cfg, params=plain.params,
                                 verb_2_vob_all={"1": [5, 6]},
                                 use_fused_attention=True,
                                 pallas_interpret=True)
    rng = np.random.RandomState(7)
    b = 4
    dets = rng.rand(b, 6, 32).astype(np.float32)
    groups = rng.rand(b, 4, 8, 32).astype(np.float32)
    groups[:, :, 5:] = 0.0

    w_p, g_p = plain.test(dets, groups)
    w_f, g_f = fast.test(dets, groups)
    np.testing.assert_array_equal(np.asarray(w_p), np.asarray(w_f))
    np.testing.assert_array_equal(np.asarray(g_p), np.asarray(g_f))

    (sw_p, sg_p), (wl_p, gl_p) = plain.sample_rl(dets, groups,
                                                 jax.random.PRNGKey(1))
    (sw_f, sg_f), (wl_f, gl_f) = fast.sample_rl(dets, groups,
                                                jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(sw_p), np.asarray(sw_f))
    np.testing.assert_array_equal(np.asarray(sg_p), np.asarray(sg_f))
    np.testing.assert_allclose(np.asarray(wl_p), np.asarray(wl_f), atol=1e-4)
