"""A/B the vocab top-k+lse kernel variants standalone (production shape).

Times the bare kernel at the bench shape (rows=5120, r=1000, v=10000, k=5,
bf16 tables) across tile configs for both merge strategies, plus the XLA
dense reference. Run on the TPU chip.

CAVEAT (axon tunnel): `block_until_ready` returns at dispatch-complete for
small standalone programs, so these loop timings can be dispatch-bound and
read far below device time (a 0.1 ms "dense XLA" for a >=0.7 ms HBM-bound
op was observed). Treat relative orderings with suspicion and confirm any
decision with scripts/ab_vocab_e2e.py (full-size interleaved decodes), or
chain iterations through a carried scalar. docs/ENGINEERING_NOTES.md.
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from vsrcic_tpu.ops.vocab_topk import make_vocab_topk_lse, vocab_topk_lse_xla

ROWS, R, V, K = 5120, 1000, 10000, 5


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    h2 = jnp.asarray(rng.randn(ROWS, R).astype(np.float32))
    w_t = jnp.asarray(rng.randn(R, V).astype(np.float32))
    bias = jnp.asarray(rng.randn(V).astype(np.float32))

    ref = jax.jit(lambda a, b, c: vocab_topk_lse_xla(a, b, c, K))
    v0, i0, l0 = ref(h2, w_t.astype(jnp.bfloat16).astype(jnp.float32), bias)
    print("xla dense           : %7.3f ms" % timeit(ref, h2, w_t, bias))

    configs = [
        (False, 1024, 1280), (False, 1024, 640), (False, 2048, 640),
        (True, 1024, 640), (True, 1024, 512), (True, 1024, 320),
        (True, 2048, 512), (True, 2048, 320), (True, 512, 640),
    ]
    for two_stage, tile_v, tile_rows in configs:
        tag = "2stage" if two_stage else "stream"
        try:
            fn = make_vocab_topk_lse(ROWS, R, V, K, tile_v=tile_v,
                                     tile_rows=tile_rows,
                                     table_dtype=jnp.bfloat16,
                                     two_stage=two_stage)
            w_p, b_p = fn.prepare_tables(w_t, bias)
            jfn = jax.jit(fn)
            vv, ii, ll = jfn(h2, w_p, b_p)
            ok = bool(jnp.array_equal(ii, i0))
            ms = timeit(jfn, h2, w_p, b_p)
            print("%s v=%4d rows=%4d : %7.3f ms  ids_match_xla_bf16=%s"
                  % (tag, tile_v, tile_rows, ms, ok))
        except Exception as e:  # VMEM OOM etc.
            print("%s v=%4d rows=%4d : FAIL %s"
                  % (tag, tile_v, tile_rows, str(e).split("\n")[0][:110]))


if __name__ == "__main__":
    main()
