"""A/B: Sinkhorn normalization — XLA fori_loop vs fused Pallas kernel —
inside the full sinkhorn_net_apply at eval-pipeline shapes (VERDICT item 5).

    python scripts/ab_sinkhorn.py [--batch 1024] [--iters 50]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--block", type=int, default=0,
                    help="also try a multi-matrix-per-block kernel variant")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vsrcic_tpu.models.sinkhorn import (SinkhornConfig,
                                            init_sinkhorn_params,
                                            sinkhorn_net_apply)

    cfg = SinkhornConfig()
    params = init_sinkhorn_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(1)
    seq = jnp.asarray(rng.rand(args.batch, cfg.n, 2352).astype(np.float32))

    f_xla = jax.jit(lambda s: sinkhorn_net_apply(params, cfg, s,
                                                 use_pallas=False))
    f_pal = jax.jit(lambda s: sinkhorn_net_apply(params, cfg, s,
                                                 use_pallas=True))

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
