"""Role-shift controllable captioning decoder, TPU-native.

Re-design of the reference two-LSTM decoder with visual-sentinel region
attention and a binary "shift to the next region group" gate
(reference: models/controllable_captioning.py:10-303). The decode-time control
flow lives in `vsrcic_tpu.decode` as jitted `lax.scan` loops; this module owns
the per-step math as pure functions so the same step powers teacher forcing,
greedy, sampling, and the joint (word x gate) beam search.

Step semantics match the reference exactly (golden-tested against the torch
model in tests/test_captioner_parity.py):

  * image descriptor = masked mean of detections        (ref :126-128)
  * LSTM1 input = [h2, image_descriptor, word_embed]    (ref :146-152, h2_first_lstm)
  * sentinel gate s_gate -> s_fc pseudo-region          (ref :151-158)
  * additive attention over [sentinel ; current group]  (ref :161-171)
  * LSTM2 -> word log-softmax                           (ref :177-178)
  * shift gate = log-softmax([g-attention, sum of masked det weights]) (ref :181-188)
  * step_v verb substitution from verb->tense tables    (ref :271-295)

TPU-first details: the detection-group attention projection (`att_va`) and
group masks are precomputed once per sequence in `precompute_statics` instead
of per step, and the verb substitution is a masked gather/argmax over a dense
``(n_verbs, max_tenses)`` id table instead of the reference's per-example
Python loop (ref :277-292).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from vsrcic_tpu.core import nn


@dataclasses.dataclass(frozen=True)
class CaptionerConfig:
    seq_len: int = 20
    vocab_size: int = 10000
    bos_idx: int = 2
    det_feat_size: int = 2048
    input_encoding_size: int = 1000
    rnn_size: int = 1000
    att_size: int = 512
    h2_first_lstm: bool = True
    img_second_lstm: bool = False


def init_captioner_params(key, cfg: CaptionerConfig, dtype=jnp.float32) -> Dict[str, Any]:
    """Init matching reference controllable_captioning.py:72-107.

    xavier_normal weights / zero biases everywhere, orthogonal LSTM
    recurrent weights, zero LSTM biases.
    """
    ks = jax.random.split(key, 16)
    d, e, r, a, v = (cfg.det_feat_size, cfg.input_encoding_size, cfg.rnn_size,
                     cfg.att_size, cfg.vocab_size)
    in1 = d + r + e if cfg.h2_first_lstm else d + e
    in2 = r + d + d if cfg.img_second_lstm else r + d

    def lin(k, i, o, bias=True):
        p = {"weight": nn.xavier_normal(k, (o, i), dtype)}
        if bias:
            p["bias"] = jnp.zeros((o,), dtype)
        return p

    def lstm(k, i, h):
        k1, k2 = jax.random.split(k)
        return {
            "weight_ih": nn.xavier_normal(k1, (4 * h, i), dtype),
            "weight_hh": jnp.concatenate(
                [nn.orthogonal(kk, (h, h), dtype)
                 for kk in jax.random.split(k2, 4)], axis=0),
            "bias_ih": jnp.zeros((4 * h,), dtype),
            "bias_hh": jnp.zeros((4 * h,), dtype),
        }

    return {
        "embed": {"weight": nn.xavier_normal(ks[0], (v, e), dtype)},
        "W1_is": lin(ks[1], in1, r),
        "W1_hs": lin(ks[2], r, r),
        "att_va": lin(ks[3], d, a, bias=False),
        "att_ha": lin(ks[4], r, a, bias=False),
        "att_a": lin(ks[5], a, 1, bias=False),
        "att_sa": lin(ks[6], r, a, bias=False),
        "att_s": lin(ks[7], a, 1, bias=False),
        "lstm_cell_1": lstm(ks[8], in1, r),
        "lstm_cell_2": lstm(ks[9], in2, r),
        "out_fc": lin(ks[10], r, v),
        "s_fc": lin(ks[11], r, d),
        "W1_ig": lin(ks[12], in1, r),
        "W1_hg": lin(ks[13], r, r),
        "att_ga": lin(ks[14], r, a, bias=False),
        "att_g": lin(ks[15], a, 1, bias=False),
    }


def derive_fused_step_weights(params, dtype=None, cfg=None):
    """Concatenate the input_1-consuming projections (W1_is, W1_ig,
    lstm_cell_1 w_ih) into one matmul and the h1_prev-consuming ones
    (W1_hs, lstm w_hh) into another — identical dot products, 5 of the
    step's 6 small matmuls collapse to 2 (W1_hg stays separate: the
    reference applies it to the POST-update h1, ref
    controllable_captioning.py:181). Derived once; decode-only.

    x-side rows: [s-gate (R), g-gate-x (R), lstm ifgo (4R)];
    h-side rows: [s-gate (R), lstm ifgo (4R)].

    dtype (e.g. bf16): also store the big step matmuls' weights (these two,
    lstm_cell_2, s_fc) in that dtype — halves the decode step's dominant
    weight DMA; matmuls accumulate f32, gates/softmaxes stay f32 (fast
    path only; round-1's WHOLESALE param cast was slower — this is the
    surgical variant).
    """
    wx = jnp.concatenate([params["W1_is"]["weight"],
                          params["W1_ig"]["weight"],
                          params["lstm_cell_1"]["weight_ih"]], 0)
    bx = jnp.concatenate([params["W1_is"]["bias"], params["W1_ig"]["bias"],
                          params["lstm_cell_1"]["bias_ih"]], 0)
    wh = jnp.concatenate([params["W1_hs"]["weight"],
                          params["lstm_cell_1"]["weight_hh"]], 0)
    bh = jnp.concatenate([params["W1_hs"]["bias"],
                          params["lstm_cell_1"]["bias_hh"]], 0)
    out = {"wx": wx, "bx": bx, "wh": wh, "bh": bh}
    if cfg is not None:
        # split out the image-descriptor columns: that input slice is
        # CONSTANT across decode steps, so its projection is hoisted to a
        # once-per-decode (items, 6R) matmul (Statics.img_y) — the img slice
        # is ~half of input_1's 4048 dims, i.e. ~half the per-step y_x FLOPs.
        # Identical dot products; the adds reassociate (fast path only).
        r, d = cfg.rnn_size, cfg.det_feat_size
        lo = r if cfg.h2_first_lstm else 0
        out["wx_img"] = wx[:, lo:lo + d]
        out["wx_nimg"] = jnp.concatenate([wx[:, :lo], wx[:, lo + d:]], 1)
    if dtype is not None:
        out["wx"] = wx.astype(dtype)
        out["wh"] = wh.astype(dtype)
        if "wx_nimg" in out:
            out["wx_nimg"] = out["wx_nimg"].astype(dtype)
            # wx_img stays f32: img_y is computed once per decode
        out["w2_ih"] = params["lstm_cell_2"]["weight_ih"].astype(dtype)
        out["w2_hh"] = params["lstm_cell_2"]["weight_hh"].astype(dtype)
        out["b2"] = (params["lstm_cell_2"]["bias_ih"]
                     + params["lstm_cell_2"]["bias_hh"])
        out["sfc_w"] = params["s_fc"]["weight"].astype(dtype)
    import os
    if os.environ.get("VSRCIC_WH_PAD6", "0") == "1":
        # A/B knob (round 5): pad the h-side fused matmul to 6R with a zero
        # block at rows [R, 2R) (the g-gate-x slice has no h1 term, ref
        # controllable_captioning.py:181) so y_x + y_h is ONE full-width
        # (B, 6R) add the compiler can keep in the matmul epilogue, instead
        # of the profiled separate slice-add passes ('x-proj slice-add',
        # 0.24 ms/step in the post-8044 autopsy). Bit-exact: the pad
        # contributes h1 @ 0 + 0 = +0.0 in f32 or bf16. Costs one extra
        # (B, R) x (R, R) matmul block (~0.06 ms at the measured MXU rate).
        r_ = params["W1_hs"]["weight"].shape[0]
        zw = jnp.zeros((r_, r_), out["wh"].dtype)
        out["wh"] = jnp.concatenate(
            [out["wh"][:r_], zw, out["wh"][r_:]], 0)
        out["bh"] = jnp.concatenate(
            [out["bh"][:r_], jnp.zeros((r_,), out["bh"].dtype),
             out["bh"][r_:]], 0)
    return out


def _mm(x, w):
    """x (B, I) @ w (O, I)^T in w's storage dtype, f32 accumulation."""
    return jax.lax.dot_general(
        x.astype(w.dtype), w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _fused_input1_block(fused_w, input_1, h1_prev, c1_prev, rnn_size,
                        img_y=None):
    """Two fused passes: returns (s_gate, g_pre_x, h1, c1); the caller
    finishes g_gate = sigmoid(g_pre_x + W1_hg(h1)).

    img_y: hoisted image-descriptor contribution (incl. bx), shape
    (rows, 6R) — input_1 must then EXCLUDE the image slice (wx_nimg
    weights). Callers expand per-item img_y to beam rows with a
    loop-invariant gather (hoisted out of the scan by XLA); an unexpanded
    (items, beam, 6R) broadcast-view add was tried here and rejected
    on-chip (−9% end-to-end: the reshapes broke epilogue fusion —
    docs/ENGINEERING_NOTES.md round-4 A/B)."""
    r = rnn_size
    wx = fused_w["wx_nimg"] if img_y is not None else fused_w["wx"]
    if wx.dtype != input_1.dtype:  # bf16-weight fast path
        y_x = _mm(input_1, wx)
        y_h = _mm(h1_prev, fused_w["wh"]) + fused_w["bh"]
    else:
        y_x = input_1 @ wx.T                              # (B, 6R)
        y_h = h1_prev @ fused_w["wh"].T + fused_w["bh"]   # (B, 5R)
    y_x = y_x + (fused_w["bx"] if img_y is None else img_y)
    if y_h.shape[-1] == 6 * r:          # VSRCIC_WH_PAD6 layout (A/B knob)
        y = y_x + y_h                   # one full-width add; pad block +0.0
        s_gate = jax.nn.sigmoid(y[:, :r])
        g_pre_x = y[:, r:2 * r]
        gates = y[:, 2 * r:]
    else:
        s_gate = jax.nn.sigmoid(y_x[:, :r] + y_h[:, :r])
        g_pre_x = y_x[:, r:2 * r]
        gates = y_x[:, 2 * r:] + y_h[:, r:]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c1 = jax.nn.sigmoid(f) * c1_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
    h1 = jax.nn.sigmoid(o) * jnp.tanh(c1)
    return s_gate, g_pre_x, h1, c1


class CaptionerState(NamedTuple):
    """Recurrent decode state. All leaves have leading batch dim."""
    h1: jnp.ndarray
    c1: jnp.ndarray
    h2: jnp.ndarray
    c2: jnp.ndarray
    ctrl_det_idx: jnp.ndarray  # (B,) int32 — current region-group pointer


def init_state(cfg: CaptionerConfig, batch: int, dtype=jnp.float32) -> CaptionerState:
    z = jnp.zeros((batch, cfg.rnn_size), dtype)
    return CaptionerState(z, z, z, z, jnp.zeros((batch,), jnp.int32))


class Statics(NamedTuple):
    """Per-sequence inputs that are constant across decode steps.

    The projection of every region group through `att_va` and the group masks
    are hoisted out of the step (computed once here), which the reference
    recomputes every step on the gathered group.
    """
    image_descriptor: jnp.ndarray      # (B, D)
    det_groups: jnp.ndarray            # (B, L, M, D) region groups
    det_groups_proj: jnp.ndarray       # (B, L, M, A) att_va(det_groups)
    det_groups_mask: jnp.ndarray       # (B, L, M) 1.0 where region non-zero
    verb_list: Optional[jnp.ndarray]   # (B, L) int32 verb ids or -1 (step_v only)
    # fast path: image_descriptor's input_1 projection + bias, hoisted out of
    # the decode scan (step-invariant; see derive_fused_step_weights)
    img_y: Optional[jnp.ndarray] = None   # (B, 6R)


def precompute_statics(params, cfg: CaptionerConfig, detections, det_groups,
                       verb_list=None) -> Statics:
    """detections: (B, N, D) raw detections; det_groups: (B, L, M, D)."""
    det_mask = (jnp.sum(detections, -1, keepdims=True) != 0).astype(detections.dtype)
    image_descriptor = jnp.sum(detections, 1) / jnp.sum(det_mask, 1)
    groups_proj = nn.linear(params["att_va"], det_groups)
    groups_mask = (jnp.sum(det_groups, -1) != 0).astype(det_groups.dtype)
    return Statics(image_descriptor, det_groups, groups_proj, groups_mask,
                   verb_list)


def _step_core(params, cfg: CaptionerConfig, state: CaptionerState,
               it, det_curr, det_curr_proj, det_curr_mask, image_descriptor,
               word_head=True):
    """Shared math of step/step_v given the already-gathered region group.

    it: (B,) int32 input word; det_curr: (B, M, D); det_curr_proj: (B, M, A);
    det_curr_mask: (B, M). Returns ((word_logp, gate_logp), new_state_core)
    where gate logits follow ref :181-188 and new_state_core excludes the
    ctrl pointer update (owned by the caller / decode loop).
    `word_head=False` skips the out_fc/log_softmax (word_logp is None); the
    caller takes h2 from the state tuple (vocab-top-k fast path).
    """
    xt = nn.embedding(params["embed"], it)

    if cfg.h2_first_lstm:
        input_1 = jnp.concatenate([state.h2, image_descriptor, xt], 1)
    else:
        input_1 = jnp.concatenate([image_descriptor, xt], 1)

    s_gate = jax.nn.sigmoid(nn.linear(params["W1_is"], input_1)
                            + nn.linear(params["W1_hs"], state.h1))
    h1, c1 = nn.lstm_cell(params["lstm_cell_1"], input_1, (state.h1, state.c1))

    s_t = s_gate * jnp.tanh(c1)
    fc_sentinel = nn.linear(params["s_fc"], s_t)          # (B, D)

    # additive attention over [sentinel ; regions]  (ref :161-171)
    ha = nn.linear(params["att_ha"], h1)                   # (B, A)
    det_w = jnp.tanh(det_curr_proj + ha[:, None, :])       # (B, M, A)
    det_w = nn.linear(params["att_a"], det_w)              # (B, M, 1)
    sent_w = jnp.tanh(nn.linear(params["att_sa"], s_t) + ha)
    sent_w = nn.linear(params["att_s"], sent_w)[:, None, :]  # (B, 1, 1)

    att = jnp.concatenate([sent_w, det_w], 1)              # (B, 1+M, 1)
    att = jax.nn.softmax(att, axis=1)
    sent_mask = (jnp.sum(fc_sentinel, -1, keepdims=True) != 0).astype(det_curr.dtype)
    regions_mask = jnp.concatenate(
        [sent_mask[:, :, None], det_curr_mask[:, :, None]], 1)  # (B, 1+M, 1)
    att = regions_mask * att
    att = att / jnp.sum(att, 1, keepdims=True)
    regions = jnp.concatenate([fc_sentinel[:, None, :], det_curr], 1)
    att_detections = jnp.sum(regions * att, 1)             # (B, D)

    if cfg.img_second_lstm:
        input_2 = jnp.concatenate([h1, att_detections, image_descriptor], 1)
    else:
        input_2 = jnp.concatenate([h1, att_detections], 1)
    h2, c2 = nn.lstm_cell(params["lstm_cell_2"], input_2, (state.h2, state.c2))
    # logits upcast: matmuls may run in bf16 (decode fast path) but scores,
    # softmaxes and beam bookkeeping stay fp32
    word_logp = None
    if word_head:
        word_logits = nn.linear(params["out_fc"], h2).astype(jnp.float32)
        word_logp = jax.nn.log_softmax(word_logits, axis=-1)

    # shift gate  (ref :181-188)
    g_gate = jax.nn.sigmoid(nn.linear(params["W1_ig"], input_1)
                            + nn.linear(params["W1_hg"], h1))
    g_t = g_gate * jnp.tanh(c1)
    gate_w = jnp.tanh(nn.linear(params["att_ga"], g_t) + ha)
    gate_w = nn.linear(params["att_g"], gate_w)            # (B, 1)
    det_w_sum = jnp.sum(det_curr_mask[:, :, None] * det_w, 1)  # (B, 1)
    gate_logits = jnp.concatenate([gate_w, det_w_sum], 1).astype(jnp.float32)
    gate_logp = jax.nn.log_softmax(gate_logits, axis=-1)

    return (word_logp, gate_logp), (h1, c1, h2, c2)


def _step_core_fused(params, cfg: CaptionerConfig, state: CaptionerState,
                     it, statics: Statics, ctrl, beam: int, fused_fn,
                     image_descriptor, fused_w=None, word_head=True):
    """_step_core variant using the fused Pallas gather+attention kernel
    (ops/fused_attention.py): the region group is DMA'd and attended on-chip;
    only the attended vector and gate evidence come back. Numerically matches
    the XLA path (kernel verified on TPU). `fused_w` (optional,
    derive_fused_step_weights) collapses the input_1/h1 projections."""
    xt = nn.embedding(params["embed"], it)
    img_y_row = getattr(statics, "img_y", None)
    if img_y_row is not None and fused_w is not None and "wx_nimg" in fused_w:
        # hoisted-img path: img projection precomputed per item (statics).
        # Beam rows gather it to (rows, 6R) with a loop-invariant index —
        # XLA hoists the gather out of the scan, so it costs one expand per
        # decode, not per step. The "smarter" alternative (pass UNEXPANDED
        # and add through an (items, beam, 6R) broadcast view inside the
        # fused block) was A/B'd on-chip and REJECTED: the reshape pair
        # around the add broke XLA's epilogue fusion and cost ~9%
        # end-to-end (7401/7427 vs 8111 caps/s, 2026-08-18 tunnel;
        # docs/ENGINEERING_NOTES.md).
        if img_y_row.shape[0] != state.h1.shape[0]:
            item = jnp.arange(state.h1.shape[0], dtype=jnp.int32) // beam
            img_y_row = img_y_row[item]
        input_1p = (jnp.concatenate([state.h2, xt], 1) if cfg.h2_first_lstm
                    else xt)
        s_gate, g_pre_x, h1, c1 = _fused_input1_block(
            fused_w, input_1p, state.h1, state.c1, cfg.rnn_size,
            img_y=img_y_row)
        input_1 = None
    elif cfg.h2_first_lstm:
        input_1 = jnp.concatenate([state.h2, image_descriptor, xt], 1)
    else:
        input_1 = jnp.concatenate([image_descriptor, xt], 1)

    if input_1 is not None:
        g_pre_x = None
        if fused_w is not None:
            s_gate, g_pre_x, h1, c1 = _fused_input1_block(
                fused_w, input_1, state.h1, state.c1, cfg.rnn_size)
        else:
            s_gate = jax.nn.sigmoid(nn.linear(params["W1_is"], input_1)
                                    + nn.linear(params["W1_hs"], state.h1))
            h1, c1 = nn.lstm_cell(params["lstm_cell_1"], input_1,
                                  (state.h1, state.c1))
    s_t = s_gate * jnp.tanh(c1)
    if fused_w is not None and "sfc_w" in fused_w:
        fc_sentinel = _mm(s_t, fused_w["sfc_w"]) + params["s_fc"]["bias"]
    else:
        fc_sentinel = nn.linear(params["s_fc"], s_t)          # (B, D)

    ha = nn.linear(params["att_ha"], h1)                      # (B, A)
    sent_w = nn.linear(params["att_s"],
                       jnp.tanh(nn.linear(params["att_sa"], s_t) + ha))
    sent_mask = (jnp.sum(fc_sentinel, -1, keepdims=True) != 0
                 ).astype(fc_sentinel.dtype)
    rows = h1.shape[0]
    item = jnp.arange(rows, dtype=jnp.int32) // beam
    att_detections, det_w_sum = fused_fn(
        item, ctrl, ha, sent_w, sent_mask, fc_sentinel,
        params["att_a"]["weight"][0], statics.det_groups,
        statics.det_groups_proj)

    if cfg.img_second_lstm:
        input_2 = jnp.concatenate([h1, att_detections, image_descriptor], 1)
    else:
        input_2 = jnp.concatenate([h1, att_detections], 1)
    if fused_w is not None and "w2_ih" in fused_w:
        gates2 = (_mm(input_2, fused_w["w2_ih"])
                  + _mm(state.h2, fused_w["w2_hh"]) + fused_w["b2"])
        i2, f2, g2, o2 = jnp.split(gates2, 4, axis=-1)
        c2 = (jax.nn.sigmoid(f2) * state.c2
              + jax.nn.sigmoid(i2) * jnp.tanh(g2))
        h2 = jax.nn.sigmoid(o2) * jnp.tanh(c2)
    else:
        h2, c2 = nn.lstm_cell(params["lstm_cell_2"], input_2,
                              (state.h2, state.c2))
    word_logp = None
    if word_head:
        word_logits = nn.linear(params["out_fc"], h2).astype(jnp.float32)
        word_logp = jax.nn.log_softmax(word_logits, axis=-1)

    if g_pre_x is None:
        g_pre_x = nn.linear(params["W1_ig"], input_1)
    g_gate = jax.nn.sigmoid(g_pre_x + nn.linear(params["W1_hg"], h1))
    g_t = g_gate * jnp.tanh(c1)
    gate_w = nn.linear(params["att_g"],
                       jnp.tanh(nn.linear(params["att_ga"], g_t) + ha))
    gate_logits = jnp.concatenate([gate_w, det_w_sum], 1).astype(jnp.float32)
    gate_logp = jax.nn.log_softmax(gate_logits, axis=-1)
    return (word_logp, gate_logp), (h1, c1, h2, c2)


def _gather_group(statics: Statics, idx, beam: int = 1):
    """Gather the current region group (+proj/mask) at ctrl pointer idx.

    `beam` > 1 means the decode rows are (item-major) beam-expanded while the
    statics tables stay UNEXPANDED at per-item batch — all beams of an item
    share its group tensor, so keeping one copy cuts the gather source (and
    HBM residency) by the beam factor; only the (rows, M, D) gather output is
    per-beam. idx: (B_items*beam,) int32.
    """
    if beam == 1:
        take = lambda a: jnp.take_along_axis(
            a, idx.reshape((-1,) + (1,) * (a.ndim - 1)), axis=1).squeeze(1)
        return take(statics.det_groups), take(statics.det_groups_proj), \
            take(statics.det_groups_mask)
    item = jnp.arange(idx.shape[0], dtype=jnp.int32) // beam
    take = lambda a: a[item, idx]
    return take(statics.det_groups), take(statics.det_groups_proj), \
        take(statics.det_groups_mask)


def _per_row(statics: Statics, beam: int, rows: int):
    """image_descriptor (and verb_list) per decode row for beam-expanded
    decodes over unexpanded statics."""
    if beam == 1:
        return statics.image_descriptor, statics.verb_list
    item = jnp.arange(rows, dtype=jnp.int32) // beam
    vl = statics.verb_list[item] if statics.verb_list is not None else None
    return statics.image_descriptor[item], vl


def captioner_step(params, cfg: CaptionerConfig, state: CaptionerState,
                   statics: Statics, it=None, det_curr=None,
                   prev_word=None, prev_gate=None, t0=False, beam: int = 1,
                   fused_fn=None, fused_w=None):
    """One decode step.

    Teacher forcing: pass `it` (B,) and `det_curr` (B, M, D).
    Feedback: pass prev_word/prev_gate (ignored at t0 where BOS is fed); the
    ctrl pointer advances by prev_gate and the group is gathered from statics
    (or attended in the fused Pallas kernel when fused_fn is given).
    `beam` > 1: decode rows are beam-expanded over unexpanded statics.
    """
    if it is not None and det_curr is not None:  # teacher forcing
        det_proj = nn.linear(params["att_va"], det_curr)
        det_mask = (jnp.sum(det_curr, -1) != 0).astype(det_curr.dtype)
        ctrl = state.ctrl_det_idx
        image_descriptor = statics.image_descriptor
    else:  # feedback
        b = state.h1.shape[0]
        if t0:
            it = jnp.full((b,), cfg.bos_idx, jnp.int32)
            ctrl = state.ctrl_det_idx
        else:
            it = prev_word
            ctrl = jnp.clip(state.ctrl_det_idx + prev_gate, 0,
                            statics.det_groups.shape[1] - 1)
        if fused_fn is not None:
            image_descriptor, _ = _per_row(statics, beam, b)
            (word_logp, gate_logp), (h1, c1, h2, c2) = _step_core_fused(
                params, cfg, state, it, statics, ctrl, beam, fused_fn,
                image_descriptor, fused_w=fused_w)
            return ((word_logp, gate_logp),
                    CaptionerState(h1, c1, h2, c2, ctrl))
        det_curr, det_proj, det_mask = _gather_group(statics, ctrl, beam)
        image_descriptor, _ = _per_row(statics, beam, b)

    (word_logp, gate_logp), (h1, c1, h2, c2) = _step_core(
        params, cfg, state, it, det_curr, det_proj, det_mask,
        image_descriptor)
    return (word_logp, gate_logp), CaptionerState(h1, c1, h2, c2, ctrl)


class VerbTenseTable(NamedTuple):
    """Dense verb -> candidate word-vocab ids (replaces verb_2_vob_all JSON).

    ids: (n_verbs+1, max_tenses) int32, -1 padded. Row v lists, in JSON list
    order, the caption-vocab ids of all tenses of verb v.
    """
    ids: jnp.ndarray

    @property
    def max_tenses(self):
        return self.ids.shape[1]


def substitute_verb(word_logp, gate_logp, verb_curr, tense_table: Optional[VerbTenseTable],
                    gt: bool):
    """Vectorized verb substitution (ref controllable_captioning.py:271-295).

    verb_curr: (B,) int32 — -1 where no substitution; verb-vocab id (pred
    mode) or caption-vocab id (gt mode) at verb slots.
    """
    b, v = word_logp.shape
    mask = (verb_curr != -1)

    if gt:
        tgt = jnp.clip(verb_curr, 0, v - 1)
    else:
        assert tense_table is not None
        cand = tense_table.ids[jnp.clip(verb_curr, 0, tense_table.ids.shape[0] - 1)]
        cand_valid = cand >= 0                                    # (B, K)
        scores = jnp.where(
            cand_valid,
            jnp.take_along_axis(word_logp, jnp.clip(cand, 0, v - 1), axis=1),
            -jnp.inf)
        best_k = jnp.argmax(scores, axis=1)                       # first max wins
        has_any = jnp.any(cand_valid, axis=1)
        tgt = jnp.where(has_any,
                        jnp.take_along_axis(cand, best_k[:, None], axis=1)[:, 0],
                        0)

    verb_out = jnp.full((b, v), -1e6, word_logp.dtype)
    verb_out = verb_out.at[jnp.arange(b), tgt].set(0.0)
    change_gate = jnp.array([-1e3, 0.0], gate_logp.dtype)

    word_out = jnp.where(mask[:, None], verb_out, word_logp)
    gate_out = jnp.where(mask[:, None], change_gate[None, :], gate_logp)
    return word_out, gate_out


def captioner_step_v(params, cfg: CaptionerConfig, state: CaptionerState,
                     statics: Statics, tense_table: Optional[VerbTenseTable],
                     prev_word=None, prev_gate=None, t0=False, gt=False,
                     beam: int = 1, fused_fn=None, fused_w=None):
    """Feedback step with verb substitution (ref step_v :192-297).

    statics.verb_list (B, L) holds -1 for non-verb slots, else the verb id
    (verb vocab in pred mode / caption vocab in gt mode).
    """
    b = state.h1.shape[0]
    if t0:
        it = jnp.full((b,), cfg.bos_idx, jnp.int32)
        ctrl = state.ctrl_det_idx
    else:
        it = prev_word
        ctrl = jnp.clip(state.ctrl_det_idx + prev_gate, 0,
                        statics.det_groups.shape[1] - 1)
    image_descriptor, verb_list = _per_row(statics, beam, b)
    # NB: the reference gathers verb_curr at t=0 too (its gather sits outside
    # the t==0 branch, ref :219-223) — a verb in the first group substitutes
    # already at the first step.
    verb_curr = jnp.take_along_axis(
        verb_list, ctrl[:, None], axis=1)[:, 0].astype(jnp.int32)

    if fused_fn is not None:
        (word_logp, gate_logp), (h1, c1, h2, c2) = _step_core_fused(
            params, cfg, state, it, statics, ctrl, beam, fused_fn,
            image_descriptor, fused_w=fused_w)
    else:
        det_curr, det_proj, det_mask = _gather_group(statics, ctrl, beam)
        (word_logp, gate_logp), (h1, c1, h2, c2) = _step_core(
            params, cfg, state, it, det_curr, det_proj, det_mask,
            image_descriptor)
    word_logp, gate_logp = substitute_verb(word_logp, gate_logp, verb_curr,
                                           tense_table, gt)
    return (word_logp, gate_logp), CaptionerState(h1, c1, h2, c2, ctrl)


def _verb_target(params, h2, verb_curr, tense_table: Optional[VerbTenseTable],
                 gt: bool, vocab_size: int):
    """Substitution target word per row WITHOUT dense logits: gathers only
    the tense-candidate columns of out_fc (same argmax as substitute_verb —
    subtracting the per-row lse does not change the argmax)."""
    if gt:
        return jnp.clip(verb_curr, 0, vocab_size - 1)
    assert tense_table is not None
    cand = tense_table.ids[jnp.clip(verb_curr, 0,
                                    tense_table.ids.shape[0] - 1)]  # (B, Kt)
    cand_valid = cand >= 0
    safe = jnp.clip(cand, 0, vocab_size - 1)
    w_cols = params["out_fc"]["weight"][safe]          # (B, Kt, R)
    logits_cand = (jnp.einsum("br,bkr->bk", h2, w_cols)
                   + params["out_fc"]["bias"][safe]).astype(jnp.float32)
    scores = jnp.where(cand_valid, logits_cand, -jnp.inf)
    best_k = jnp.argmax(scores, axis=1)                # first max wins
    has_any = jnp.any(cand_valid, axis=1)
    return jnp.where(has_any,
                     jnp.take_along_axis(cand, best_k[:, None], axis=1)[:, 0],
                     0)


def captioner_step_v_topk(params, cfg: CaptionerConfig, state: CaptionerState,
                          statics: Statics,
                          tense_table: Optional[VerbTenseTable],
                          vocab_fn, out_fc_tables,
                          prev_word=None, prev_gate=None, t0=False, gt=False,
                          beam: int = 1, k: int = 5, fused_fn=None,
                          fused_w=None):
    """captioner_step_v variant emitting the compact candidate set consumed
    by decode.beam.beam_search_joint_candidates instead of dense word_logp.

    vocab_fn(h2, w_t, bias) -> (vals (B,k), ids (B,k), lse (B,1)) — either
    ops.vocab_topk.vocab_topk_lse_xla or the streaming Pallas kernel.
    out_fc_tables: (w_t, bias) possibly pre-padded via fn.prepare_tables.
    Returns ((cand_ids (B, k+1), cand_wlp (B, k+1), gate_logp), state).
    """
    b = state.h1.shape[0]
    v = cfg.vocab_size
    if t0:
        it = jnp.full((b,), cfg.bos_idx, jnp.int32)
        ctrl = state.ctrl_det_idx
    else:
        it = prev_word
        ctrl = jnp.clip(state.ctrl_det_idx + prev_gate, 0,
                        statics.det_groups.shape[1] - 1)
    image_descriptor, verb_list = _per_row(statics, beam, b)
    verb_curr = jnp.take_along_axis(
        verb_list, ctrl[:, None], axis=1)[:, 0].astype(jnp.int32)

    if fused_fn is not None:
        (_, gate_logp), (h1, c1, h2, c2) = _step_core_fused(
            params, cfg, state, it, statics, ctrl, beam, fused_fn,
            image_descriptor, fused_w=fused_w, word_head=False)
    else:
        det_curr, det_proj, det_mask = _gather_group(statics, ctrl, beam)
        (_, gate_logp), (h1, c1, h2, c2) = _step_core(
            params, cfg, state, it, det_curr, det_proj, det_mask,
            image_descriptor, word_head=False)

    w_t, bias = out_fc_tables
    vals, ids, lse = vocab_fn(h2, w_t, bias)
    wlp_topk = vals - lse                                      # (B, k)

    # normal rows: top-k words + an inert slot (id 0, -inf)
    norm_ids = jnp.concatenate(
        [ids, jnp.zeros((b, 1), jnp.int32)], axis=1)           # (B, k+1)
    norm_wlp = jnp.concatenate(
        [wlp_topk, jnp.full((b, 1), -jnp.inf)], axis=1)

    # verb rows: forced tense word (logp 0) + the k lowest ids excluding the
    # target (logp -1e6) — reproduces substitute_verb's sea + flat tie order
    tgt = _verb_target(params, h2, verb_curr, tense_table, gt, v)
    sea_base = jnp.arange(k, dtype=jnp.int32)[None, :]          # (1, k)
    sea_ids = sea_base + (tgt[:, None] <= sea_base)             # skip tgt
    verb_ids = jnp.concatenate([tgt[:, None].astype(jnp.int32),
                                sea_ids.astype(jnp.int32)], axis=1)
    verb_wlp = jnp.concatenate(
        [jnp.zeros((b, 1)), jnp.full((b, k), -1e6)], axis=1)

    is_verb = (verb_curr != -1)[:, None]
    cand_ids = jnp.where(is_verb, verb_ids, norm_ids)
    cand_wlp = jnp.where(is_verb, verb_wlp, norm_wlp)

    change_gate = jnp.array([-1e3, 0.0], gate_logp.dtype)
    gate_out = jnp.where(is_verb, change_gate[None, :], gate_logp)
    return ((cand_ids, cand_wlp, gate_out),
            CaptionerState(h1, c1, h2, c2, ctrl))
