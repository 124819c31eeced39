"""XE train-step wall time at reference scale, batch sweep.

Device-resident inputs (compact group ids expanded on device, as the
training CLI's compact path ships them); measures the jitted
CaptionerXETrainer.step end-to-end including the host->device of nothing
(inputs staged once) — the number BASELINE.md tracks.

    python scripts/bench_xe.py            # batches 100 256 512
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vsrcic_tpu.models.captioner import (CaptionerConfig,
                                             init_captioner_params)
    from vsrcic_tpu.train import CaptionerXETrainer

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    D = 2048 if on_tpu else 32
    V = 10000 if on_tpu else 40
    cfg = CaptionerConfig(seq_len=20, vocab_size=V, bos_idx=2,
                          det_feat_size=D,
                          input_encoding_size=1000 if on_tpu else 16,
                          rnn_size=1000 if on_tpu else 16,
                          att_size=512 if on_tpu else 8)
    params = init_captioner_params(jax.random.PRNGKey(0), cfg)

    import os
    batches = tuple(int(x) for x in os.environ.get(
        "VSRCIC_XE_BATCHES", "100,256,512").split(","))
    # VSRCIC_XE_LEAN=0 A/Bs the expand-once dense-residual loss against
    # the default rematted scan (same values; see xe_loss_fn)
    lean = bool(int(os.environ.get("VSRCIC_XE_LEAN", "1")))
    for B in (batches if on_tpu else (4,)):
        tr = CaptionerXETrainer(cfg, params, lr=5e-4, lean=lean)
        rng = np.random.RandomState(0)
        dets = jnp.asarray(rng.rand(B, 100, D).astype(np.float32))
        caps = jnp.asarray(rng.randint(0, V, size=(B, 20)).astype(np.int32))
        # compact control ids, expanded on device inside the loss
        ids = jnp.asarray(rng.randint(-1, 100,
                                      size=(B, 20, 20)).astype(np.int32))
        gates = jnp.asarray(rng.randint(0, 2, size=(B, 20)).astype(np.int32))
        tr.step(dets, caps, ids, gates)  # compile
        n = 10 if on_tpu else 2
        t0 = time.perf_counter()
        for _ in range(n):
            tr.step(dets, caps, ids, gates)
        dt = (time.perf_counter() - t0) / n
        print('{"metric": "xe_step_ms_batch%d", "value": %.1f, '
              '"unit": "ms/step", "examples_per_sec": %.1f}'
              % (B, dt * 1e3, B / dt))


if __name__ == "__main__":
    from vsrcic_tpu.utils.retry import with_backend_retry

    with_backend_retry(main, attempts=5, label="bench_xe",
                       probe_timeout=150.0)
