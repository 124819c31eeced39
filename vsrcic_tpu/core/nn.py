"""Pure-functional NN primitives with PyTorch-compatible parameter layout.

Parameters are plain nested-dict pytrees. Weight layouts intentionally match
torch (`Linear.weight` is ``(out, in)``, ``LSTMCell`` uses the i,f,g,o gate
packing) so that released ``.pth`` checkpoints from the reference
(mad-red/VSR-guided-CIC) import as a pure key-rename, and so that golden
parity tests can copy torch weights verbatim.

All ``apply`` functions are jit-safe pure functions of (params, inputs).
"""
from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initializers (numerics match torch.nn.init)
# ---------------------------------------------------------------------------

def xavier_normal(key, shape, dtype=jnp.float32):
    """torch.nn.init.xavier_normal_ for a 2-D ``(fan_out, fan_in)`` weight."""
    fan_out, fan_in = shape[0], math.prod(shape[1:])
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def xavier_uniform(key, shape, dtype=jnp.float32):
    fan_out, fan_in = shape[0], math.prod(shape[1:])
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


def orthogonal(key, shape, dtype=jnp.float32):
    """torch.nn.init.orthogonal_ (gain 1) for a 2-D weight."""
    n_rows, n_cols = shape
    big = max(n_rows, n_cols)
    a = jax.random.normal(key, (big, big), dtype)
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diagonal(r))  # make deterministic-sign
    return q[:n_rows, :n_cols]


def kaiming_uniform_linear(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default weight init: kaiming_uniform(a=sqrt(5))."""
    fan_in = math.prod(shape[1:])
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------

def linear_init(key, in_features, out_features, bias=True, init="torch_default",
                dtype=jnp.float32) -> Params:
    kw, kb = jax.random.split(key)
    if init == "torch_default":
        w = kaiming_uniform_linear(kw, (out_features, in_features), dtype)
    elif init == "xavier_normal":
        w = xavier_normal(kw, (out_features, in_features), dtype)
    elif init == "xavier_uniform":
        w = xavier_uniform(kw, (out_features, in_features), dtype)
    else:
        raise ValueError(init)
    p = {"weight": w}
    if bias:
        if init == "torch_default":
            bound = math.sqrt(1.0 / in_features)
            p["bias"] = jax.random.uniform(kb, (out_features,), dtype,
                                           minval=-bound, maxval=bound)
        else:
            p["bias"] = jnp.zeros((out_features,), dtype)
    return p


def linear(p: Params, x):
    y = x @ p["weight"].T
    if "bias" in p:
        y = y + p["bias"]
    return y


# ---------------------------------------------------------------------------
# Embedding
# ---------------------------------------------------------------------------

def embedding_init(key, num_embeddings, features, init="normal",
                   dtype=jnp.float32) -> Params:
    if init == "normal":          # torch default N(0, 1)
        w = jax.random.normal(key, (num_embeddings, features), dtype)
    elif init == "xavier_normal":
        w = xavier_normal(key, (num_embeddings, features), dtype)
    elif init == "xavier_uniform":
        w = xavier_uniform(key, (num_embeddings, features), dtype)
    else:
        raise ValueError(init)
    return {"weight": w}


def embedding(p: Params, ids):
    return p["weight"][ids]


# ---------------------------------------------------------------------------
# LSTM cell (torch gate packing: i, f, g, o)
# ---------------------------------------------------------------------------

def lstm_cell_init(key, input_size, hidden_size, dtype=jnp.float32) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = math.sqrt(1.0 / hidden_size)

    def u(k, shape):
        return jax.random.uniform(k, shape, dtype, minval=-bound, maxval=bound)

    return {
        "weight_ih": u(k1, (4 * hidden_size, input_size)),
        "weight_hh": u(k2, (4 * hidden_size, hidden_size)),
        "bias_ih": u(k3, (4 * hidden_size,)),
        "bias_hh": u(k4, (4 * hidden_size,)),
    }


def lstm_cell(p: Params, x, state):
    """One LSTM step. state = (h, c); returns (h', c')."""
    h, c = state
    gates = x @ p["weight_ih"].T + p["bias_ih"] + h @ p["weight_hh"].T + p["bias_hh"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


# ---------------------------------------------------------------------------
# LayerNorm (matches torch.nn.LayerNorm: biased variance, eps inside sqrt)
# ---------------------------------------------------------------------------

def layer_norm_init(size, dtype=jnp.float32) -> Params:
    return {"weight": jnp.ones((size,), dtype), "bias": jnp.zeros((size,), dtype)}


def layer_norm(p: Params, x, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * p["weight"] + p["bias"]


# ---------------------------------------------------------------------------
# Misc
# ---------------------------------------------------------------------------

def log_softmax(x, axis=-1):
    return jax.nn.log_softmax(x, axis=axis)


def softmax(x, axis=-1):
    return jax.nn.softmax(x, axis=axis)
