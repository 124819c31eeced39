"""Beam decode bottleneck ablation (run on TPU).

Times beam_search_v variants: full model, no-vocab (small out_fc), no-group-
gather (fixed group), K=1, smaller batch — to locate where the step time goes.
"""
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from vsrcic_tpu.models.api import ControllableCaptioner
from vsrcic_tpu.models.captioner import CaptionerConfig


def bench_one(name, cfg, batch, beam, L=10, M=20, n_det=50, iters=5):
    key = jax.random.PRNGKey(0)
    cap = ControllableCaptioner(
        cfg, key=key,
        verb_2_vob_all={str(i): [5 + i, 40 + i] for i in range(1, 200)})
    kd, kg, kv = jax.random.split(key, 3)
    detections = jax.random.normal(kd, (batch, n_det, cfg.det_feat_size))
    det_groups = jax.random.normal(kg, (batch, L, M, cfg.det_feat_size))
    verb_list = jnp.where(jax.random.uniform(kv, (batch, L)) < 0.15,
                          jax.random.randint(kv, (batch, L), 1, 150),
                          -1).astype(jnp.int32)

    def run():
        res = cap.beam_search_v(detections, det_groups, verb_list,
                                eos_word=3, beam_size=beam)
        return res.words.block_until_ready()

    run()
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters
    print("%-28s batch=%4d beam=%d  %7.1f caps/s  (%.1f ms/batch)"
          % (name, batch, beam, batch / dt, dt * 1e3))
    return batch / dt


full = CaptionerConfig(seq_len=20, vocab_size=10000, bos_idx=2,
                       det_feat_size=2048, input_encoding_size=1000,
                       rnn_size=1000, att_size=512)


if __name__ == "__main__":
    bench_one("full", full, 256, 5)
    bench_one("full batch=512", full, 512, 5)
    bench_one("vocab=512",
              CaptionerConfig(**{**full.__dict__, "vocab_size": 512}), 256, 5)
    bench_one("rnn=256", CaptionerConfig(**{**full.__dict__, "rnn_size": 256,
                                            "input_encoding_size": 256}),
              256, 5)
    bench_one("det_feat=512",
              CaptionerConfig(**{**full.__dict__, "det_feat_size": 512}),
              256, 5)
    bench_one("M=1 groups", full, 256, 5, M=1)
    bench_one("beam=1", full, 256, 1)
    bench_one("seq_len=10",
              CaptionerConfig(**{**full.__dict__, "seq_len": 10}), 256, 5)
