"""Fused Pallas kernel for the Sinkhorn row/column normalization loop.

The reference runs 20 normalization iterations as 40 separate tiny tensor ops
(reference models/sinkhorn_network.py:30-37); under XLA that is a chain of
40 kernel launches reading/writing HBM each time. This kernel keeps the whole
(N, N) score matrix in VMEM and runs the entire iteration loop on-chip —
one launch, zero intermediate HBM traffic.

The matrices are tiny (N=10), so per-image blocks are mapped over a 1-D grid;
the jnp fallback in models/sinkhorn.py stays the reference semantics (and the
CPU path). Parity: exact same exp/eps/order of operations.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

EPS = 10e-8


def _kernel(x_ref, o_ref, *, n_iters: float, tau: float):
    v = jnp.exp(x_ref[:] / tau)                       # (1, N, N)

    def body(_, v):
        v = v / (EPS + jnp.sum(v, -2, keepdims=True))
        v = v / (EPS + jnp.sum(v, -1, keepdims=True))
        return v

    o_ref[:] = jax.lax.fori_loop(0, n_iters, body, v)


@functools.partial(jax.jit, static_argnames=("n_iters", "tau"))
def sinkhorn_normalize_pallas(x, n_iters: int = 20, tau: float = 0.1):
    """x: (B, N, N) scores -> soft permutation, fused on-chip loop."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, _ = x.shape
    kernel = functools.partial(_kernel, n_iters=n_iters, tau=float(tau))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x.astype(jnp.float32))
