"""Assignment rounding for Sinkhorn soft permutations.

The reference rounds each soft permutation with the pure-Python `munkres`
package per example inside the eval loop (reference eval_coco.py:188-199:
`munkres.make_cost_matrix(mx)` then `Munkres().compute`). Here:

  * `hungarian_assign` — scipy's C Jonker-Volgenant on host, batched over all
    pairs of an eval batch at once;
  * `greedy_assign_device` — a jittable O(N^2)-argmax alternative that stays
    on device (used by the fused eval path; for tau as low as the reference's
    0.1 the Sinkhorn output is near-hard and both rounding schemes agree).
"""
from __future__ import annotations


import numpy as np


def hungarian_assign(profit: np.ndarray) -> np.ndarray:
    """Max-profit assignment. profit: (..., N, N) -> (..., N) col per row.

    Matches the reference's munkres usage: make_cost_matrix converts profit
    to cost (max - p) and Munkres minimizes, i.e. profit maximization.
    """
    from scipy.optimize import linear_sum_assignment

    p = np.asarray(profit)
    if p.ndim == 2:
        rows, cols = linear_sum_assignment(-p)
        out = np.empty(p.shape[0], np.int64)
        out[rows] = cols
        return out
    return np.stack([hungarian_assign(x) for x in p])


def greedy_assign_device(profit):
    """Jittable greedy max rounding: iteratively pick the global max entry,
    mask its row+col. profit: (N, N) -> (N,) int32 col per row."""
    import jax
    import jax.numpy as jnp

    n = profit.shape[-1]

    def body(carry, _):
        p, out = carry
        flat = jnp.argmax(p)
        r, c = flat // n, flat % n
        out = out.at[r].set(c.astype(jnp.int32))
        p = p.at[r, :].set(-jnp.inf).at[:, c].set(-jnp.inf)
        return (p, out), None

    (_, out), _ = jax.lax.scan(
        body, (profit.astype(jnp.float32),
               jnp.zeros((n,), jnp.int32)), None, length=n)
    return out
