"""SCST RL step wall time at reference scale (VERDICT #6 'Done' criterion).

Measures trainer.step (fused sample+greedy decode -> host PTB+CIDEr reward
-> in-graph logprob recompute + grad step) with device-resident inputs, both
baseline modes, batch >= 64.
"""
import os, sys, time
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

from vsrcic_tpu.metrics import Cider
from vsrcic_tpu.models.captioner import CaptionerConfig, init_captioner_params
from vsrcic_tpu.text import TextField, ptb_tokenize
from vsrcic_tpu.train.captioner import CaptionerSCSTTrainer

def main():
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    B = int(os.environ.get("VSRCIC_SCST_BATCH", 64 if on_tpu else 4))
    D = 2048 if on_tpu else 32
    words = ["w%d" % i for i in range(200)]
    rng = np.random.RandomState(0)
    caps = [" ".join(rng.choice(words, rng.randint(6, 15))) for _ in range(B)]
    tf = TextField(fix_length=20)
    tf.build_vocab(caps, min_freq=1)
    cfg = CaptionerConfig(seq_len=20, vocab_size=len(tf.vocab), bos_idx=tf.bos_idx,
                          det_feat_size=D,
                          input_encoding_size=1000 if on_tpu else 16,
                          rnn_size=1000 if on_tpu else 16,
                          att_size=512 if on_tpu else 8)
    params = init_captioner_params(jax.random.PRNGKey(0), cfg)
    cider = Cider(gts=ptb_tokenize({i: [c] for i, c in enumerate(caps)}))
    dets = jnp.asarray(rng.rand(B, 50, D).astype(np.float32))
    groups = jnp.asarray(rng.rand(B, 10, 20, D).astype(np.float32))

    fast = bool(int(os.environ.get("VSRCIC_SCST_FAST", "0")))
    from vsrcic_tpu.metrics.cider_native import maybe_native
    native = maybe_native(cider)
    for mode in ("step", "epoch"):
        tr = CaptionerSCSTTrainer(cfg, params, tf, cider, lr=5e-4,
                                  baseline=mode, fast_decode=fast,
                                  table_dtype=jnp.bfloat16 if fast else None,
                                  native_cider=native)
        base = tr.epoch_baseline_caps(dets, groups) if mode == "epoch" else None
        tr.step(dets, groups, caps, jax.random.PRNGKey(0), baseline_caps=base)
        n = 5 if on_tpu else 1
        t0 = time.perf_counter()
        for i in range(n):
            tr.step(dets, groups, caps, jax.random.PRNGKey(i + 1),
                    baseline_caps=base)
        dt = (time.perf_counter() - t0) / n
        print('{"metric": "scst_step_ms_batch%d_%s", "value": %.1f, '
              '"unit": "ms/step", "examples_per_sec": %.1f}'
              % (B, mode, dt * 1e3, B / dt))

if __name__ == "__main__":
    from vsrcic_tpu.utils.retry import with_backend_retry

    with_backend_retry(main, attempts=5, label="bench_scst",
                       probe_timeout=150.0)
