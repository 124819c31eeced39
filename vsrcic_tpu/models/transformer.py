"""Transformer blocks for the S-level SSP planner, pure-functional JAX.

Behavioral re-design of the reference blocks (models/transformer_modules.py,
models/sort_modules.py) with torch-layout params for checkpoint import.
Numerics intentionally preserved for parity with released checkpoints:

  * attention logits masked with -1e3 (not -inf)       (ref transformer_modules.py:47)
  * embeddings scaled by sqrt(d)                       (ref :202)
  * pre-LN layers with plain residual adds             (ref :321-344)
  * decoder "cross"-attention reuses the self-attention projection weights —
    the reference layer calls `self.attention` instead of
    `self.cross_attention` (ref sort_modules.py:87); released checkpoints
    were trained with this, so we reproduce it (the unused cross_attention
    params are still created/imported for state-dict compatibility).

Dropout is supported for training via an explicit rng + rate; eval passes
deterministic=True.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from vsrcic_tpu.core import nn

MASK_FILL = -1e3


# ---------------------------------------------------------------------------
# init helpers: xavier_uniform weights, torch-default biases
# (reference S_SSP.initialize_parameters applies xavier_uniform to every
#  param with dim > 1, leaving biases at their module defaults)
# ---------------------------------------------------------------------------

def _lin(key, i, o, bias=True):
    p = nn.linear_init(key, i, o, bias=bias)
    kw, _ = jax.random.split(key)
    p["weight"] = nn.xavier_uniform(kw, (o, i))
    return p


RELATIVE_POS_CLIP = 2  # ref transformer_modules.py:73


def mha_init(key, size, relative_pos=False):
    ks = jax.random.split(key, 5)
    p = {
        "linear_Q": _lin(ks[0], size, size),
        "linear_K": _lin(ks[1], size, size),
        "linear_V": _lin(ks[2], size, size),
        "linear_O": _lin(ks[3], size, size),
    }
    if relative_pos:
        p["relative_posmatrix"] = {
            "weight": nn.xavier_uniform(ks[4],
                                        (RELATIVE_POS_CLIP * 2 + 1, size))}
    return p


def mha_apply(p, query, keys, values, mask=None, n_heads=8,
              dropout_rate=0.0, rng=None):
    """Multi-head attention (ref transformer_modules.py:106-134).

    mask: broadcastable to (B, heads, Tq, Tk); positions where mask==0 get
    logits MASK_FILL. When p carries "relative_posmatrix" the clipped
    relative-position logits are added BEFORE the sqrt scaling and broadcast
    over heads, computed from the full (unsplit) transformed query — exactly
    ref :103-115 + KeyValAttention :39-42.
    """
    b, tq, size = query.shape
    hd = size // n_heads

    def split_heads(x):
        return x.reshape(x.shape[0], -1, n_heads, hd).transpose(0, 2, 1, 3)

    tq_full = nn.linear(p["linear_Q"], query)           # (B, Tq, H)
    q = split_heads(tq_full)
    k = split_heads(nn.linear(p["linear_K"], keys))
    v = split_heads(nn.linear(p["linear_V"], values))

    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    if "relative_posmatrix" in p:
        t1 = keys.shape[1]
        rel = jnp.clip(jnp.arange(t1)[None, :] - jnp.arange(tq)[:, None],
                       -RELATIVE_POS_CLIP, RELATIVE_POS_CLIP)
        rpe = p["relative_posmatrix"]["weight"][rel + RELATIVE_POS_CLIP]
        logits = logits + jnp.einsum("bqh,qkh->bqk", tq_full, rpe)[:, None]
    logits = logits / math.sqrt(hd)
    if mask is not None:
        logits = jnp.where(mask == 0, MASK_FILL, logits)
    w = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, w.shape)
        w = jnp.where(keep, w / (1.0 - dropout_rate), 0.0)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, tq, size)
    return nn.linear(p["linear_O"], ctx)


def ff_init(key, size, hidden):
    k1, k2 = jax.random.split(key)
    return {"w_1": _lin(k1, size, hidden), "w_2": _lin(k2, hidden, size)}


def ff_apply(p, x, dropout_rate=0.0, rng=None):
    h = jax.nn.relu(nn.linear(p["w_1"], x))
    h = _dropout(h, dropout_rate, rng)
    return nn.linear(p["w_2"], h)


def _dropout(x, rate, rng):
    if rate > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
        return jnp.where(keep, x / (1.0 - rate), 0.0)
    return x


def encoder_layer_init(key, size, ff_size):
    ks = jax.random.split(key, 2)
    return {
        "attention": mha_init(ks[0], size),
        "ff_layer": ff_init(ks[1], size, ff_size),
        "layer_norm1": nn.layer_norm_init(size),
        "layer_norm2": nn.layer_norm_init(size),
    }


def encoder_layer_apply(p, x, mask=None, n_heads=8, dropout_rate=0.0, rng=None):
    """Pre-LN self-attention + FF (ref transformer_modules.py:333-344)."""
    r = jax.random.split(rng, 4) if rng is not None else (None,) * 4
    y1 = nn.layer_norm(p["layer_norm1"], x)
    y1 = mha_apply(p["attention"], y1, y1, y1, mask=mask, n_heads=n_heads,
                   dropout_rate=dropout_rate, rng=r[0])
    y1 = _dropout(y1, dropout_rate, r[1]) + x
    y2 = nn.layer_norm(p["layer_norm2"], y1)
    y2 = ff_apply(p["ff_layer"], y2, dropout_rate=dropout_rate, rng=r[2])
    y2 = _dropout(y2, dropout_rate, r[3]) + y1
    return y2


def decoder_layer_init(key, size, ff_size):
    ks = jax.random.split(key, 3)
    return {
        "attention": mha_init(ks[0], size),
        "cross_attention": mha_init(ks[1], size),  # unused in fwd (see module doc)
        "ff_layer": ff_init(ks[2], size, ff_size),
        "layer_norm1": nn.layer_norm_init(size),
        "layer_norm2": nn.layer_norm_init(size),
        "layer_norm3": nn.layer_norm_init(size),
    }


def decoder_layer_apply(p, x, x_mask, y, y_mask=None, n_heads=8,
                        dropout_rate=0.0, rng=None):
    """Self-attn -> cross-attn -> FF (ref sort_modules.py:77-97).

    NB: cross-attention deliberately uses p["attention"] (see module doc).
    """
    r = jax.random.split(rng, 6) if rng is not None else (None,) * 6
    h1 = nn.layer_norm(p["layer_norm1"], x)
    h1 = mha_apply(p["attention"], h1, h1, h1, mask=x_mask, n_heads=n_heads,
                   dropout_rate=dropout_rate, rng=r[0])
    h1 = _dropout(h1, dropout_rate, r[1]) + x
    h2 = nn.layer_norm(p["layer_norm2"], h1)
    h2 = mha_apply(p["attention"], h2, y, y, mask=y_mask, n_heads=n_heads,
                   dropout_rate=dropout_rate, rng=r[2])
    h2 = _dropout(h2, dropout_rate, r[3]) + h1
    h3 = nn.layer_norm(p["layer_norm3"], h2)
    h3 = ff_apply(p["ff_layer"], h3, dropout_rate=dropout_rate, rng=r[4])
    h3 = _dropout(h3, dropout_rate, r[5]) + h2
    return h3


def temporal_mask(x_or_len):
    """(1, T, T) causal mask, 1 below/on the diagonal (ref
    transformer_modules.py:247-269); accepts an int length or an embedding
    (B, T, H)."""
    t = x_or_len if isinstance(x_or_len, int) else x_or_len.shape[-2]
    return jnp.tril(jnp.ones((1, t, t), jnp.float32))


def generic_decoder_layer_apply(p, encoder_states, decoder_states,
                                src_mask=None, tgt_mask=None, n_heads=8,
                                dropout_rate=0.0, rng=None, last_only=False):
    """The generic (upstream-unused) TransformerDecoderLayer
    (ref transformer_modules.py:347-386), incl. its quirks: cross-attention
    also calls `self.attention` (ref :378) and `last_only=True` computes the
    self-attention query from only the final position (incremental decode,
    ref :364-368). Params: decoder_layer_init."""
    r = jax.random.split(rng, 6) if rng is not None else (None,) * 6
    y1 = nn.layer_norm(p["layer_norm1"], decoder_states)
    if last_only:
        y1 = mha_apply(p["attention"], y1[:, -1:], y1, y1, mask=tgt_mask,
                       n_heads=n_heads, dropout_rate=dropout_rate, rng=r[0])
        y1 = _dropout(y1, dropout_rate, r[1]) + decoder_states[:, -1:]
    else:
        y1 = mha_apply(p["attention"], y1, y1, y1, mask=tgt_mask,
                       n_heads=n_heads, dropout_rate=dropout_rate, rng=r[0])
        y1 = _dropout(y1, dropout_rate, r[1]) + decoder_states
    y2 = nn.layer_norm(p["layer_norm2"], y1)
    y2 = mha_apply(p["attention"], y2, encoder_states, encoder_states,
                   mask=src_mask, n_heads=n_heads, dropout_rate=dropout_rate,
                   rng=r[2])
    y2 = _dropout(y2, dropout_rate, r[3]) + y1
    y3 = nn.layer_norm(p["layer_norm3"], y2)
    y3 = ff_apply(p["ff_layer"], y3, dropout_rate=dropout_rate, rng=r[4])
    y3 = _dropout(y3, dropout_rate, r[5]) + y2
    return y3


def positional_encoding(length, size, dtype=jnp.float32):
    """Sinusoidal table (ref transformer_modules.py:272-299)."""
    pos = jnp.arange(length, dtype=dtype)[:, None]
    div = jnp.exp(jnp.arange(0, size, 2, dtype=dtype) * -(math.log(10000.0) / size))
    pe = jnp.zeros((length, size), dtype)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe


def transformer_embed(p, ids, size, positional=False, dropout_rate=0.0, rng=None):
    """Scaled embedding lookup (ref transformer_modules.py:193-214)."""
    e = p["weight"][ids] * math.sqrt(size)
    if positional:
        e = e + positional_encoding(ids.shape[-1], size, e.dtype)
    return _dropout(e, dropout_rate, rng)


def label_smoothing_kldiv(log_probs, targets, mask, n_classes, smoothing=0.1):
    """Sum-reduced KLDiv vs smoothed one-hot (ref transformer_modules.py:150-179).

    log_probs: (N, C) model log-probs; targets: (N,) int; mask: (N,) {0,1}.
    """
    sval = smoothing / (n_classes - 2)
    conf = 1.0 - smoothing
    p = jnp.full(log_probs.shape, sval, log_probs.dtype)
    p = p.at[jnp.arange(log_probs.shape[0]), targets].set(conf)
    p = jnp.where((mask == 0)[:, None], 0.0, p)
    # kl_div(input=log q, target=p, sum) = sum p * (log p - log q), 0log0 := 0
    plogp = jnp.where(p > 0, p * jnp.log(jnp.where(p > 0, p, 1.0)), 0.0)
    return jnp.sum(plogp - p * log_probs)
