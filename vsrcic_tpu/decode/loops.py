"""Jitted decode loops for the role-shift captioner.

Replaces the Python `for t in range(seq_len)` harness of the reference decode
engine (reference: models/CaptioningModel.py:22-76) with `lax.scan` so the
whole sequence compiles to a single XLA while-op with device-resident state.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vsrcic_tpu.models.captioner import (
    CaptionerConfig, CaptionerState, Statics, captioner_step, init_state,
    precompute_statics,
)


def expand_compact_groups(detections, det_ids):
    """Device-side region-group construction from compact indices.

    detections: (B, N, D); det_ids: (B, ..., M) int32 with -1 padding ->
    (B, ..., M, D) feature groups (padding rows zero). This replaces shipping
    materialized (B, T, M, D) control tensors from the host — an ~8x smaller
    transfer (the fields' `compact=True` mode emits the indices); values are
    exactly the dense tensors the reference fields produce.
    """
    b = detections.shape[0]
    n = detections.shape[1]
    d = detections.shape[-1]
    safe = jnp.clip(det_ids, 0, n - 1)
    # take_along_axis, NOT detections[iota(b), safe]: the explicit batch-iota
    # operand hides the batch alignment from GSPMD, which then partitions
    # the gather with collectives inside the decode scan (deadlocks the CPU
    # in-process communicator and would all-gather on TPU); batched gather
    # dims keep it shard-local under a data-sharded batch axis
    flat = safe.reshape(b, -1)                            # (B, K)
    feats = jnp.take_along_axis(detections, flat[..., None], axis=1)
    feats = feats.reshape(det_ids.shape + (d,))           # (B, ..., M, D)
    return jnp.where((det_ids >= 0)[..., None], feats, 0.0)


def forward_teacher_forcing_compact(params, cfg: CaptionerConfig, detections,
                                    captions, det_ids):
    """Teacher forcing with on-device group expansion (see expand_compact_groups)."""
    return forward_teacher_forcing(params, cfg, detections, captions,
                                   expand_compact_groups(detections, det_ids))


def forward_teacher_forcing(params, cfg: CaptionerConfig, detections,
                            captions, ctrl_det_seqs):
    """Teacher-forced forward (ref CaptioningModel.forward :22-36).

    detections: (B, N, D); captions: (B, T) int32; ctrl_det_seqs: (B, T, M, D).
    Returns (word_logp (B, T, V), gate_logp (B, T, 2)).

    The group attention projections for all T steps are computed as one batched
    matmul before the scan (MXU-friendly), not per step.
    """
    b, t_len = captions.shape
    statics = precompute_statics(params, cfg, detections, ctrl_det_seqs)
    det_proj_all = statics.det_groups_proj            # (B, T, M, A)
    det_mask_all = statics.det_groups_mask            # (B, T, M)

    xs = (
        jnp.moveaxis(captions, 1, 0),                 # (T, B)
        jnp.moveaxis(ctrl_det_seqs, 1, 0),            # (T, B, M, D)
        jnp.moveaxis(det_proj_all, 1, 0),
        jnp.moveaxis(det_mask_all, 1, 0),
    )

    from vsrcic_tpu.models.captioner import _step_core

    def body(state: CaptionerState, x):
        it, det_curr, det_proj, det_mask = x
        (w, g), (h1, c1, h2, c2) = _step_core(
            params, cfg, state, it, det_curr, det_proj, det_mask,
            statics.image_descriptor)
        return CaptionerState(h1, c1, h2, c2, state.ctrl_det_idx), (w, g)

    _, (word_logp, gate_logp) = jax.lax.scan(body, init_state(cfg, b), xs)
    return jnp.moveaxis(word_logp, 0, 1), jnp.moveaxis(gate_logp, 0, 1)


def greedy_decode(params, cfg: CaptionerConfig, statics: Statics,
                  seq_len: Optional[int] = None, fused_fn=None, fused_w=None):
    """Greedy feedback decode (ref CaptioningModel.test :38-52).

    Returns (words (B, T), gates (B, T)).
    """
    t_len = seq_len or cfg.seq_len
    b = statics.image_descriptor.shape[0]

    def step_fn(state, prev_word, prev_gate, t0):
        return captioner_step(params, cfg, state, statics,
                              prev_word=prev_word, prev_gate=prev_gate,
                              t0=t0, fused_fn=fused_fn, fused_w=fused_w)

    def body(carry, _):
        state, prev_word, prev_gate, t = carry
        (w_logp, g_logp), state = jax.lax.cond(
            t == 0,
            lambda s: step_fn(s, prev_word, prev_gate, True),
            lambda s: step_fn(s, prev_word, prev_gate, False),
            state)
        word = jnp.argmax(w_logp, -1).astype(jnp.int32)
        gate = jnp.argmax(g_logp, -1).astype(jnp.int32)
        return (state, word, gate, t + 1), (word, gate)

    init = (init_state(cfg, b), jnp.zeros((b,), jnp.int32),
            jnp.zeros((b,), jnp.int32), jnp.int32(0))
    _, (words, gates) = jax.lax.scan(body, init, None, length=t_len)
    return jnp.moveaxis(words, 0, 1), jnp.moveaxis(gates, 0, 1)


def forced_feedback_logprobs(params, cfg: CaptionerConfig, statics: Statics,
                             words, gates, remat: bool = False):
    """Differentiable logprobs of a given (word, gate) trajectory.

    Re-runs the feedback decode feeding the *given* outputs back (the region
    pointer advances by the given gates), returning per-step logprobs of those
    outputs. This is how SCST gets gradients in JAX: sampling runs without
    autodiff (sample_decode), rewards are computed on host, then this function
    recomputes the trajectory's logprobs inside the grad transform —
    numerically identical to the reference's stored `log_probs`
    (ref CaptioningModel.sample_rl :54-76 keeps them in-graph).

    remat=True wraps the scan body in `jax.checkpoint`: the backward pass
    recomputes each step's gathered group/attention internals instead of
    storing them as residuals (same values and gradients, ~1 extra forward
    of FLOPs) — at batch 1024 the stored residuals otherwise OOM HBM
    (16.5 G > 15.75 G, docs/ENGINEERING_NOTES 'SCST batch sweep').
    """
    b, t_len = words.shape

    def body(carry, x):
        state, prev_word, prev_gate, t = carry
        word_t, gate_t = x
        step = lambda t0: captioner_step(params, cfg, state, statics,
                                         prev_word=prev_word,
                                         prev_gate=prev_gate, t0=t0)
        (w_logp, g_logp), new_state = jax.lax.cond(
            t == 0, lambda _: step(True), lambda _: step(False), None)
        w_lp = jnp.take_along_axis(w_logp, word_t[:, None], 1)[:, 0]
        g_lp = jnp.take_along_axis(g_logp, gate_t[:, None], 1)[:, 0]
        return (new_state, word_t, gate_t, t + 1), (w_lp, g_lp)

    if remat:
        body = jax.checkpoint(body, prevent_cse=False)
    xs = (jnp.moveaxis(words, 0, 1), jnp.moveaxis(gates, 0, 1))
    init = (init_state(cfg, b), jnp.zeros((b,), jnp.int32),
            jnp.zeros((b,), jnp.int32), jnp.int32(0))
    _, (w_lps, g_lps) = jax.lax.scan(body, init, xs)
    return jnp.moveaxis(w_lps, 0, 1), jnp.moveaxis(g_lps, 0, 1)


def sample_decode(params, cfg: CaptionerConfig, statics: Statics, key,
                  seq_len: Optional[int] = None, fused_fn=None, fused_w=None):
    """Ancestral sampling with per-step logprobs (ref sample_rl :54-76).

    Returns ((words, gates), (word_logps, gate_logps)) each (B, T).
    Sampling is device-resident (no host round trip), powering SCST.
    """
    t_len = seq_len or cfg.seq_len
    b = statics.image_descriptor.shape[0]
    keys = jax.random.split(key, t_len)

    def body(carry, key_t):
        state, prev_word, prev_gate, t = carry
        step = lambda t0: captioner_step(params, cfg, state, statics,
                                         prev_word=prev_word,
                                         prev_gate=prev_gate, t0=t0,
                                         fused_fn=fused_fn, fused_w=fused_w)
        (w_logp, g_logp), new_state = jax.lax.cond(
            t == 0, lambda _: step(True), lambda _: step(False), None)
        kw, kg = jax.random.split(key_t)
        word = jax.random.categorical(kw, w_logp).astype(jnp.int32)
        gate = jax.random.categorical(kg, g_logp).astype(jnp.int32)
        w_lp = jnp.take_along_axis(
            jax.nn.log_softmax(w_logp, -1), word[:, None], 1)[:, 0]
        g_lp = jnp.take_along_axis(
            jax.nn.log_softmax(g_logp, -1), gate[:, None], 1)[:, 0]
        return (new_state, word, gate, t + 1), (word, gate, w_lp, g_lp)

    init = (init_state(cfg, b), jnp.zeros((b,), jnp.int32),
            jnp.zeros((b,), jnp.int32), jnp.int32(0))
    _, (words, gates, w_lps, g_lps) = jax.lax.scan(body, init, keys)
    tr = lambda a: jnp.moveaxis(a, 0, 1)
    return (tr(words), tr(gates)), (tr(w_lps), tr(g_lps))
