"""R-level SSP: Sinkhorn soft-permutation network.

Re-design of the reference SinkhornNet (models/sinkhorn_network.py:5-51):
per-row MLP over concatenated (visual, text, position) region features
followed by iterative row/column normalization of exp(score/tau).

Fidelity note (SURVEY.md M3): the reference slices its 2352-d input as
[:300] -> W1_txt, [300:2348] -> W1_vis, [2348:] -> pos, but every caller
concatenates (vis 2048, txt 300, pos 4) — so the "txt" branch actually sees
the first 300 visual dims. We replicate the slicing (offsets), not the names,
because the released checkpoints were trained this way.

The normalization loop runs on device via `lax.fori_loop` over the WHOLE
(B, N, N) batch — a fused per-matrix Pallas kernel was built and A/B'd on
the chip and LOST (3.4 ms vs 0.9 ms at batch 1024: (1, 10, 10) blocks pad
to full lanes and serialize 1024 grid steps while XLA vectorizes the batch
per iteration), so it was removed; decision record in
docs/ENGINEERING_NOTES.md, scripts/ab_sinkhorn.py reproduces the A/B.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from vsrcic_tpu.core import nn

EPS = 10e-8  # ref sinkhorn_network.py:34-35


@dataclasses.dataclass(frozen=True)
class SinkhornConfig:
    n: int = 10          # permutation size
    n_iters: int = 20
    tau: float = 0.1
    txt_dim: int = 300   # slice sizes of the 2352-d input (see module doc)
    vis_dim: int = 2048
    pos_dim: int = 4


def init_sinkhorn_params(key, cfg: SinkhornConfig) -> Dict[str, Any]:
    """xavier_normal weights / zero biases (ref :18-28)."""
    ks = jax.random.split(key, 5)

    def lin(k, i, o):
        return {"weight": nn.xavier_normal(k, (o, i)), "bias": jnp.zeros((o,))}

    return {
        "W1_txt": lin(ks[0], cfg.txt_dim, 128),
        "W1_vis": lin(ks[1], cfg.vis_dim, 512),
        "W2_vis": lin(ks[2], 512, 128),
        "W_fc_pos": lin(ks[3], 256 + cfg.pos_dim, 256),
        "W_fc": lin(ks[4], 256, cfg.n),
    }


def sinkhorn_normalize(x, n_iters: int, tau: float):
    """exp(x/tau) then alternate column/row normalization (ref :30-37)."""
    x = jnp.exp(x / tau)

    def body(_, x):
        x = x / (EPS + jnp.sum(x, -2, keepdims=True))
        x = x / (EPS + jnp.sum(x, -1, keepdims=True))
        return x

    return jax.lax.fori_loop(0, n_iters, body, x)


def sinkhorn_net_apply(params, cfg: SinkhornConfig, seq):
    """seq: (B, N, txt+vis+pos) -> soft permutation (B, N, N).

    Default dims reproduce the reference's 2352-d slicing exactly
    (:300 / 300:2348 / 2348:, incl. the mislabeled-slice quirk — module
    docstring); non-default dims exist for reduced-width test worlds."""
    x_txt = seq[:, :, :cfg.txt_dim]
    x_vis = seq[:, :, cfg.txt_dim:cfg.txt_dim + cfg.vis_dim]
    x_pos = seq[:, :, cfg.txt_dim + cfg.vis_dim:]
    x_txt = jax.nn.relu(nn.linear(params["W1_txt"], x_txt))
    x_vis = jax.nn.relu(nn.linear(params["W1_vis"], x_vis))
    x_vis = jax.nn.relu(nn.linear(params["W2_vis"], x_vis))
    x = jnp.concatenate([x_txt, x_vis, x_pos], axis=-1)
    x = jax.nn.relu(nn.linear(params["W_fc_pos"], x))
    x = jnp.tanh(nn.linear(params["W_fc"], x))
    return sinkhorn_normalize(x, cfg.n_iters, cfg.tau)
