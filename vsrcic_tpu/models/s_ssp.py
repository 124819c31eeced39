"""S-level SSP: verb-conditioned semantic-role sequence planner.

Re-design of the reference pointer model (models/sort_model.py:13-183):
a 3-layer transformer encoder over (verb-embedding + SR-token) inputs and a
3-layer causal decoder that autoregressively emits the role order, trained
with label-smoothed KLDiv.

TPU-first decode: the reference re-runs the decoder on a growing Python-list
prefix and, in constrained mode, book-keeps the remaining-role multiset with
a per-example Python loop (ref :149-181). Here generation is one `lax.scan`
over a fixed-size token buffer (causal+pad masking makes the suffix inert),
and the constrained selection is a batched masked argmax over the remaining
input slots — bit-identical selection semantics (first max wins, slot-order
ties as in `masked_select`), no host round trips, any batch size.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from vsrcic_tpu.core import nn
from vsrcic_tpu.models import transformer as tfm

N_SR = 26  # semantic-role vocab (25 roles + pad/eos 0), ref field.py:187-189


@dataclasses.dataclass(frozen=True)
class SSPConfig:
    dataset: str = "coco"
    encoder_layers: int = 3
    decoder_layers: int = 3
    max_len: int = 10
    hidden_size: int = 512
    embed_size: int = 512
    n_heads: int = 8
    pos_enc: bool = False
    add_fc: bool = True
    dropout: float = 0.1

    @property
    def verb_size(self) -> int:
        return 2662 if self.dataset == "coco" else 2926  # ref sort_model.py:19-22

    @property
    def ff_size(self) -> int:
        return self.hidden_size * 4


def init_ssp_params(key, cfg: SSPConfig) -> Dict[str, Any]:
    ks = jax.random.split(key, 8)
    h = cfg.hidden_size

    enc_layers = {str(i): tfm.encoder_layer_init(k, h, cfg.ff_size)
                  for i, k in enumerate(jax.random.split(ks[0], cfg.encoder_layers))}
    dec_layers = {str(i): tfm.decoder_layer_init(k, h, cfg.ff_size)
                  for i, k in enumerate(jax.random.split(ks[1], cfg.decoder_layers))}

    params = {
        "sr_embed_layer": {"weight": nn.xavier_uniform(ks[2], (N_SR, cfg.embed_size))},
        "v_embed_layer": {"weight": nn.xavier_uniform(ks[3], (cfg.verb_size + 1, cfg.embed_size))},
        "encoder": {"layer_norm": nn.layer_norm_init(h), "encoder_layers": enc_layers},
        "decoder": {"layer_norm": nn.layer_norm_init(h), "encoder_layers": dec_layers},
        "expander_nn": tfm._lin(ks[4], h, N_SR),
    }
    if cfg.add_fc:
        params["encoder"]["fc_feat"] = tfm._lin(ks[5], h, h)
    return params


def _maybe_keys(rng, n):
    return jax.random.split(rng, n) if rng is not None else (None,) * n


def ssp_encode(params, cfg: SSPConfig, verb, det_sr, rng=None):
    """Encoder (ref sort_modules.py:49-60). verb: (B,) or (B,1); det_sr: (B, L)."""
    rate = cfg.dropout if rng is not None else 0.0
    r = _maybe_keys(rng, 2 + cfg.encoder_layers)
    verb = jnp.asarray(verb).astype(jnp.int32) % 10000
    if verb.ndim == 1:
        verb = verb[:, None]
    det_sr = jnp.asarray(det_sr).astype(jnp.int32)
    v = tfm.transformer_embed(params["v_embed_layer"], verb, cfg.embed_size,
                              dropout_rate=rate, rng=r[0])
    s = tfm.transformer_embed(params["sr_embed_layer"], det_sr, cfg.embed_size,
                              positional=cfg.pos_enc, dropout_rate=rate, rng=r[1])
    x = v + s
    if cfg.add_fc:
        x = nn.linear(params["encoder"]["fc_feat"], x)
    for i in range(cfg.encoder_layers):
        x = tfm.encoder_layer_apply(
            params["encoder"]["encoder_layers"][str(i)], x, mask=None,
            n_heads=cfg.n_heads, dropout_rate=rate, rng=r[2 + i])
    return nn.layer_norm(params["encoder"]["layer_norm"], x)


def ssp_decode(params, cfg: SSPConfig, tokens, prior_states, rng=None):
    """Causal decoder over SR tokens (ref sort_modules.py:119-134).

    tokens: (B, S) int — position 0 is <bos>=0; pad is 0. The self-attention
    mask blocks future positions and token==0 keys (reference semantics).
    """
    rate = cfg.dropout if rng is not None else 0.0
    r = _maybe_keys(rng, 1 + cfg.decoder_layers)
    tokens = jnp.asarray(tokens).astype(jnp.int32)
    b, s = tokens.shape
    length_mask = (tokens == 0)[:, None, :].astype(jnp.float32)      # (B,1,S)
    triu = jnp.triu(jnp.ones((s, s), jnp.float32), k=1)[None]        # (1,S,S)
    self_mask = ((triu + length_mask) == 0)[:, None]                 # (B,1,S,S)
    x = tfm.transformer_embed(params["sr_embed_layer"], tokens,
                              cfg.embed_size, dropout_rate=rate, rng=r[0])
    for i in range(cfg.decoder_layers):
        x = tfm.decoder_layer_apply(
            params["decoder"]["encoder_layers"][str(i)], x, self_mask,
            prior_states, None, n_heads=cfg.n_heads,
            dropout_rate=rate, rng=r[1 + i])
    return nn.layer_norm(params["decoder"]["layer_norm"], x)


def ssp_forward_loss(params, cfg: SSPConfig, verb, det_sr, gt_sr, rng=None,
                     row_weights=None):
    """Teacher-forced label-smoothed loss (ref sort_model.py:80-103).

    row_weights (B,): optional 0/1 row mask — position 0 of every row is
    otherwise always counted (dec_mask starts with 1), so zero-PADDED rows
    would shift the loss; weighting them out keeps a padded batch's loss
    exactly equal to the unpadded one (data-parallel non-divisible
    batches, SSPTrainer mesh path)."""
    gt_sr = jnp.asarray(gt_sr).astype(jnp.int32)
    b, l = gt_sr.shape
    sr_mask = (gt_sr != 0).astype(jnp.float32)
    dec_in = jnp.concatenate([jnp.zeros((b, 1), jnp.int32), gt_sr], 1)      # (B, L+1)
    dec_mask = jnp.concatenate([jnp.ones((b, 1), jnp.float32), sr_mask], 1)
    if row_weights is not None:
        dec_mask = dec_mask * jnp.asarray(row_weights,
                                          jnp.float32)[:, None]
    targets = jnp.concatenate([gt_sr, jnp.zeros((b, 1), jnp.int32)], 1)  # (B, L+1)

    r_enc, r_dec = _maybe_keys(rng, 2)
    prior = ssp_encode(params, cfg, verb, det_sr, rng=r_enc)
    states = ssp_decode(params, cfg, dec_in, prior, rng=r_dec)
    logits = nn.linear(params["expander_nn"], states)                       # (B, L+1, 26)
    logp = jax.nn.log_softmax(logits, axis=-1)
    denom = jnp.sum(dec_mask)
    loss = tfm.label_smoothing_kldiv(
        logp.reshape(-1, N_SR), targets.reshape(-1), dec_mask.reshape(-1),
        N_SR) / denom
    return loss


def _generate_loop(cfg: SSPConfig, det_sr, mode, logp_step, extra0,
                   n_steps=None):
    """Shared greedy selection loop for ssp_generate / ssp_generate_fast.

    logp_step(extra, x_buf, t) -> (logp (B, 26), extra'): next-token
    log-probs at buffer position t. `extra` threads implementation state
    (e.g. K/V caches) through the scan.

    n_steps (static, constrained mode only): truncate the scan to this many
    steps. Each constrained step emits exactly one not-yet-used input slot,
    so once every row's slot multiset is exhausted the remaining steps are
    inert — they write it=0 / lps=0.0, the buffers' init values (the same
    equivalence that justified rejecting the early-exit while_loop, see the
    comment below). Passing n_steps >= max-slots-in-batch is therefore
    output-IDENTICAL to the full t_max scan while skipping the dead steps'
    decoder compute (pinned in tests/test_ssp_fast.py).
    """
    b, l = det_sr.shape
    t_max = cfg.max_len
    constrained = mode != "normal"
    if n_steps is None or not constrained:
        n_steps = t_max
    n_steps = min(int(n_steps), t_max)

    if constrained:
        # NB: fixed-length scan, deliberately. An all-rows-exhausted
        # early-exit while_loop is output-identical (inactive steps write
        # it=0 / lps=0.0 — the init values) and was tried; on TPU it
        # measured ~10 MINUTES of XLA compile for this KV-cached body vs
        # seconds for the scan, for a few ms/batch of steady-state win
        # (decision record: docs/ENGINEERING_NOTES.md round-3 ledger).
        def body(carry, t):
            x_buf, remain, pred, lps, extra = carry
            active = jnp.sum(remain, 1) > 0                          # (B,)
            logp, extra = logp_step(extra, x_buf, t)
            slot_scores = jnp.where(
                remain > 0,
                jnp.take_along_axis(logp, det_sr, axis=1), -jnp.inf)  # (B, L)
            j = jnp.argmax(slot_scores, axis=1)                      # first max wins
            val = jnp.take_along_axis(det_sr, j[:, None], 1)[:, 0]
            score = jnp.max(slot_scores, axis=1)
            it = jnp.where(active, val, 0).astype(jnp.int32)
            pred = pred.at[:, t].set(it)
            lps = lps.at[:, t].set(jnp.where(active, score, 0.0))
            clear = jax.nn.one_hot(j, l, dtype=remain.dtype) * active[:, None]
            remain = remain * (1 - clear)
            x_buf = x_buf.at[:, t + 1].set(it)
            return (x_buf, remain, pred, lps, extra), None

        remain0 = (det_sr != 0).astype(jnp.int32)
        carry = (jnp.zeros((b, t_max + 1), jnp.int32), remain0,
                 jnp.zeros((b, t_max), jnp.int32), jnp.zeros((b, t_max)),
                 extra0)
        (x_buf, remain, pred, lps, _), _ = jax.lax.scan(
            body, carry, jnp.arange(n_steps))
        return pred, lps

    def body(carry, t):
        x_buf, unfinished, alldone, pred, lps, extra = carry
        execute = jnp.logical_not(alldone)
        logp, extra = logp_step(extra, x_buf, t)
        score = jnp.max(logp, axis=-1)
        it = jnp.argmax(logp, axis=-1).astype(jnp.int32)
        unf_new = jnp.where(t == 0, it > 0, unfinished & (it > 0))
        it_w = it * unf_new.astype(jnp.int32)
        pred = pred.at[:, t].set(jnp.where(execute, it_w, pred[:, t]))
        lps = lps.at[:, t].set(jnp.where(execute, score, lps[:, t]))
        x_buf = x_buf.at[:, t + 1].set(jnp.where(execute, it_w, 0))
        alldone = alldone | jnp.logical_not(jnp.any(unf_new))
        return (x_buf, unf_new, alldone, pred, lps, extra), None

    carry = (jnp.zeros((b, t_max + 1), jnp.int32),
             jnp.ones((b,), bool), jnp.asarray(False),
             jnp.zeros((b, t_max), jnp.int32), jnp.zeros((b, t_max)),
             extra0)
    (x_buf, _, _, pred, lps, _), _ = jax.lax.scan(
        body, carry, jnp.arange(t_max))
    return pred, lps


def ssp_generate(params, cfg: SSPConfig, verb, det_sr, mode="normal",
                 n_steps=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Autoregressive role-order generation (ref sort_model.py:105-183).

    mode='normal': unconstrained greedy with the reference's finished logic.
    Anything else (the eval scripts pass 'not-normal'): constrained — each
    step's argmax is restricted to the multiset of input SRs not yet emitted.
    n_steps: static scan truncation, see _generate_loop (constrained only).

    Returns (pred (B, max_len) int32, logprobs (B, max_len) float32).
    """
    det_sr = jnp.asarray(det_sr).astype(jnp.int32)
    prior = ssp_encode(params, cfg, verb, det_sr)

    def logp_step(extra, x_buf, t):
        states = ssp_decode(params, cfg, x_buf, prior)
        logits = nn.linear(params["expander_nn"],
                           jax.lax.dynamic_index_in_dim(states, t, 1, keepdims=False))
        return jax.nn.log_softmax(logits, axis=-1), extra            # (B, 26)

    return _generate_loop(cfg, det_sr, mode, logp_step, None, n_steps=n_steps)


def ssp_generate_fast(params, cfg: SSPConfig, verb, det_sr, mode="normal",
                      n_steps=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Incremental (KV-cached) ssp_generate — same outputs, ~T× less decoder
    compute per step.

    The reference decoder recomputes the full fixed-size token buffer every
    step (ref sort_model.py:129-147, ported by ssp_generate). Caching is
    exact here because of three verified properties of the reference masking
    (token==0 keys masked with -1e3, which underflows to weight 0 in fp32
    next to any live key):

      1. a position's states are final once its token is written — later
         steps never change them (tokens are append-only and zero-terminal);
      2. token-0 positions (<bos>, pad, finished tails) are masked as KEYS
         everywhere, so their step-varying states never propagate;
      3. the only *read* of a degenerate all-keys-masked query is position t
         of a row whose buffer is entirely zeros (incl. every row at t=0),
         and with no positional encoding in the decoder embedding those
         outputs equal the corresponding position of one all-zeros-buffer
         pass, computed here once up front.

    Per step this computes only position t through the layers (Q/K/V on one
    position, attention over the 11-slot cache, cross-attention over per-
    layer precomputed K/V of the encoder states), instead of an 11-position
    full decoder pass. Exactness is pinned by tests/test_ssp_fast.py
    (array-equal vs ssp_generate, both modes).
    """
    import math as _math

    from vsrcic_tpu.models import transformer as tfm

    det_sr = jnp.asarray(det_sr).astype(jnp.int32)
    b, l = det_sr.shape
    s = cfg.max_len + 1
    n_heads = cfg.n_heads
    hd = cfg.hidden_size // n_heads
    prior = ssp_encode(params, cfg, verb, det_sr)
    layers = [params["decoder"]["encoder_layers"][str(i)]
              for i in range(cfg.decoder_layers)]

    # one SINGLE-POSITION pass over an all-zeros buffer: the degenerate-query
    # outputs. With every key masked, attention is uniform over identical
    # per-position states and the decoder embedding has no positional term,
    # so all S positions of a full zeros pass are equal — computing one
    # position is exact (pinned vs ssp_generate in tests/test_ssp_fast.py)
    # and drops an 11-position decoder pass to 1.
    zero_states = ssp_decode(params, cfg, jnp.zeros((b, 1), jnp.int32), prior)
    zero_logp = jax.nn.log_softmax(
        nn.linear(params["expander_nn"], zero_states), axis=-1)   # (B, 1, 26)

    # cross-attention K/V once per layer (the reference layer runs cross
    # attention with the SELF-attention projections, sort_modules.py:87)
    cross_kv = tuple((nn.linear(lp["attention"]["linear_K"], prior),
                      nn.linear(lp["attention"]["linear_V"], prior))
                     for lp in layers)

    # fused per-layer QKV projection: one (H, 3H) matmul per step instead of
    # three (H, H) — same values (concat of the three affine maps), fewer
    # tiny kernels inside the scan body
    qkv_fused = tuple(
        (jnp.concatenate([lp["attention"]["linear_Q"]["weight"],
                          lp["attention"]["linear_K"]["weight"],
                          lp["attention"]["linear_V"]["weight"]], 0),
         jnp.concatenate([lp["attention"]["linear_Q"]["bias"],
                          lp["attention"]["linear_K"]["bias"],
                          lp["attention"]["linear_V"]["bias"]], 0))
        for lp in layers)

    def heads(x):
        return x.reshape(b, -1, n_heads, hd).transpose(0, 2, 1, 3)

    def unheads(x):
        return x.transpose(0, 2, 1, 3).reshape(b, -1, cfg.hidden_size)

    def attend(q, k, v, key_mask=None):
        # mirrors tfm.mha_apply: einsum -> /sqrt(hd) -> -1e3 fill -> softmax
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / _math.sqrt(hd)
        if key_mask is not None:
            logits = jnp.where(key_mask, logits, tfm.MASK_FILL)
        return unheads(jnp.einsum("bhqk,bhkd->bhqd",
                                  jax.nn.softmax(logits, -1), v))

    def logp_step(caches, x_buf, t):
        tok = jax.lax.dynamic_index_in_dim(x_buf, t, 1, keepdims=True)
        x = tfm.transformer_embed(params["sr_embed_layer"], tok,
                                  cfg.embed_size)                  # (B, 1, H)
        # positions > t still hold token 0 in x_buf, so this single mask is
        # exactly the reference's causal+pad key mask for query position t
        key_mask = (x_buf != 0)[:, None, None, :]                  # (B,1,1,S)
        new_caches = []
        for lp, (ck, cv), (qkv_w, qkv_b), (k_cache, v_cache) in zip(
                layers, cross_kv, qkv_fused, caches):
            y1 = nn.layer_norm(lp["layer_norm1"], x)
            q_, k_, v_ = jnp.split(y1 @ qkv_w.T + qkv_b, 3, axis=-1)
            # caches live pre-headed as (B, nh, S, hd): the per-step update
            # writes one (B, nh, 1, hd) slice and attend reads them directly
            # (no full-cache head-split transpose every step)
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, heads(k_), (0, 0, t, 0))
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, heads(v_), (0, 0, t, 0))
            new_caches.append((k_cache, v_cache))
            h1 = nn.linear(lp["attention"]["linear_O"],
                           attend(heads(q_), k_cache, v_cache,
                                  key_mask)) + x
            y2 = nn.layer_norm(lp["layer_norm2"], h1)
            q2 = heads(nn.linear(lp["attention"]["linear_Q"], y2))
            h2 = nn.linear(lp["attention"]["linear_O"],
                           attend(q2, heads(ck), heads(cv))) + h1
            y3 = nn.layer_norm(lp["layer_norm3"], h2)
            x = tfm.ff_apply(lp["ff_layer"], y3) + h2
        states_t = nn.layer_norm(params["decoder"]["layer_norm"], x)[:, 0]
        logp = jax.nn.log_softmax(
            nn.linear(params["expander_nn"], states_t), axis=-1)   # (B, 26)
        # degenerate rows (no live keys: nothing emitted yet, which includes
        # every row at t=0) read the all-zeros-buffer pass instead
        deg = jax.lax.dynamic_index_in_dim(x_buf, 1, 1, keepdims=False) == 0
        return jnp.where(deg[:, None], zero_logp[:, 0], logp), \
            tuple(new_caches)

    caches0 = tuple(
        (jnp.zeros((b, n_heads, s, hd)), jnp.zeros((b, n_heads, s, hd)))
        for _ in layers)
    return _generate_loop(cfg, det_sr, mode, logp_step, caches0,
                          n_steps=n_steps)


def ssp_beam_search(params, cfg: SSPConfig, verb, det_sr, beam_size: int = 3
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched beam search over role sequences.

    The reference ships a `sample_beam`/`beam_search` pair that is dead code —
    it calls a nonexistent `self.prior_encoder` (reference sort_model.py:193)
    and host-loops per example — so there is no upstream behavior to
    reproduce. This is a functional replacement: device-resident, batched,
    token 0 = <eos>; finished beams extend only with <eos> at zero cost.

    Returns (sequences (B, beam, max_len) int32 sorted by score desc,
    scores (B, beam)).
    """
    det_sr = jnp.asarray(det_sr).astype(jnp.int32)
    b, l = det_sr.shape
    k = beam_size
    t_max = cfg.max_len
    prior = ssp_encode(params, cfg, verb, det_sr)
    prior_k = jnp.repeat(prior, k, axis=0)            # (B*K, L, H)

    x_buf = jnp.zeros((b * k, t_max + 1), jnp.int32)
    scores = jnp.tile(jnp.where(jnp.arange(k) == 0, 0.0, -jnp.inf)[None],
                      (b, 1))                          # only beam 0 live at t0
    alive = jnp.ones((b, k), bool)
    seqs = jnp.zeros((b, k, t_max), jnp.int32)

    def logprobs_at(x_buf, t):
        states = ssp_decode(params, cfg, x_buf, prior_k)
        logits = nn.linear(params["expander_nn"],
                           jax.lax.dynamic_index_in_dim(states, t, 1,
                                                        keepdims=False))
        return jax.nn.log_softmax(logits, axis=-1)     # (B*K, 26)

    def body(carry, t):
        x_buf, scores, alive, seqs = carry
        logp = logprobs_at(x_buf, t).reshape(b, k, N_SR)
        # finished beams: only token 0 at zero added cost
        eos_only = jnp.where(jnp.arange(N_SR) == 0, 0.0, -jnp.inf)
        logp = jnp.where(alive[:, :, None], logp, eos_only[None, None, :])
        total = scores[:, :, None] + logp              # (B, K, 26)
        flat_scores, idx = jax.lax.top_k(total.reshape(b, k * N_SR), k)
        sel_beam = idx // N_SR
        tok = (idx - sel_beam * N_SR).astype(jnp.int32)

        gather2 = lambda a: jnp.take_along_axis(a, sel_beam, axis=1)
        seqs = jnp.take_along_axis(seqs, sel_beam[:, :, None], axis=1)
        seqs = seqs.at[:, :, t].set(tok)
        alive = gather2(alive.astype(jnp.int32)).astype(bool) & (tok != 0)
        row = (jnp.arange(b * k) // k) * k
        x_buf = x_buf[row + sel_beam.reshape(-1)]
        x_buf = x_buf.at[:, t + 1].set(tok.reshape(-1))
        return (x_buf, flat_scores, alive, seqs), None

    (x_buf, scores, alive, seqs), _ = jax.lax.scan(
        body, (x_buf, scores, alive, seqs), jnp.arange(t_max))
    return seqs, scores
