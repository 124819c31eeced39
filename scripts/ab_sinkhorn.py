"""A/B decision record: Sinkhorn normalization — XLA batched fori_loop vs a
fused per-matrix Pallas kernel — inside the full sinkhorn_net_apply at
eval-pipeline shapes.

Measured on a v5e chip at batch 1024 (2026-08-17): xla 0.92 ms,
pallas 3.36 ms, max|diff| 2.4e-7 — **XLA wins** (the (1, 10, 10) blocks pad
to full lanes and serialize 1024 grid steps; XLA vectorizes the whole batch
per iteration and the 40-op chain fuses fine). The kernel was therefore
REMOVED from production (models/sinkhorn.py always uses the XLA path); the
losing kernel lives here so the decision stays reproducible.

    python scripts/ab_sinkhorn.py [--batch 1024] [--iters 50]
"""
import argparse
import functools
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

EPS = 10e-8


@functools.partial(__import__("jax").jit, static_argnames=("n_iters", "tau"))
def sinkhorn_normalize_pallas(x, n_iters: int = 20, tau: float = 0.1):
    """The removed kernel: whole iteration loop on-chip per (N, N) matrix."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, _ = x.shape

    def kernel(x_ref, o_ref):
        v = jnp.exp(x_ref[:] / tau)

        def body(_, v):
            v = v / (EPS + jnp.sum(v, -2, keepdims=True))
            v = v / (EPS + jnp.sum(v, -1, keepdims=True))
            return v

        o_ref[:] = jax.lax.fori_loop(0, n_iters, body, v)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x.astype(jnp.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vsrcic_tpu.core import nn
    from vsrcic_tpu.models.sinkhorn import (SinkhornConfig,
                                            init_sinkhorn_params,
                                            sinkhorn_net_apply)

    cfg = SinkhornConfig()
    params = init_sinkhorn_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(1)
    seq = jnp.asarray(rng.rand(args.batch, cfg.n, 2352).astype(np.float32))

    def apply_pallas(s):
        x_txt = jax.nn.relu(nn.linear(params["W1_txt"], s[:, :, :300]))
        x_vis = jax.nn.relu(nn.linear(params["W1_vis"], s[:, :, 300:2348]))
        x_vis = jax.nn.relu(nn.linear(params["W2_vis"], x_vis))
        x = jnp.concatenate([x_txt, x_vis, s[:, :, 2348:]], axis=-1)
        x = jax.nn.relu(nn.linear(params["W_fc_pos"], x))
        x = jnp.tanh(nn.linear(params["W_fc"], x))
        return sinkhorn_normalize_pallas(x, cfg.n_iters, cfg.tau)

    f_xla = jax.jit(lambda s: sinkhorn_net_apply(params, cfg, s))
    f_pal = jax.jit(apply_pallas)

    out = {}
    for name, fn in (("xla", f_xla), ("pallas", f_pal)):
        try:
            r = fn(seq)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                r = fn(seq)
            jax.block_until_ready(r)
            out[name + "_ms"] = round(
                (time.perf_counter() - t0) / args.iters * 1e3, 4)
        except Exception as e:  # pallas may be unsupported on this backend
            out[name + "_error"] = str(e)[:200]
    if "xla_ms" in out and "pallas_ms" in out:
        a = np.asarray(f_xla(seq))
        b = np.asarray(f_pal(seq))
        out["max_abs_diff"] = float(np.max(np.abs(a - b)))
        out["winner"] = "pallas" if out["pallas_ms"] < out["xla_ms"] else "xla"
    out["batch"] = args.batch
    print(json.dumps(out))


if __name__ == "__main__":
    main()
