"""Round-2 beam ablation at the FAST config (fused attn + bf16 tables +
vocab megakernel): shrink one dimension at a time to locate the remaining
cost. Run on TPU."""
import time
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from vsrcic_tpu.models.api import ControllableCaptioner
from vsrcic_tpu.models.captioner import CaptionerConfig


def bench_one(name, cfg, batch=256, beam=5, L=10, M=20, n_det=50, iters=8,
              fused=True, vocab_topk=True):
    key = jax.random.PRNGKey(0)
    cap = ControllableCaptioner(
        cfg, key=key,
        verb_2_vob_all={str(i): [5 + i, 40 + i] for i in range(1, 200)},
        use_fused_attention=fused, table_dtype=jnp.bfloat16,
        use_vocab_topk=vocab_topk)
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
    print("%-30s %7.1f caps/s  (%.1f ms/batch)"
          % (name, batch / dt, dt * 1e3), flush=True)


FULL = dict(seq_len=20, vocab_size=10000, bos_idx=2, det_feat_size=2048,
            input_encoding_size=1000, rnn_size=1000, att_size=512)

if __name__ == "__main__":
    bench_one("full (fast config)", CaptionerConfig(**FULL))
    bench_one("vocab=512", CaptionerConfig(**{**FULL, "vocab_size": 512}))
    bench_one("det_feat=512",
              CaptionerConfig(**{**FULL, "det_feat_size": 512}))
    bench_one("rnn=256", CaptionerConfig(**{**FULL, "rnn_size": 256}))
    bench_one("embed=256",
              CaptionerConfig(**{**FULL, "input_encoding_size": 256}))
    bench_one("att=128", CaptionerConfig(**{**FULL, "att_size": 128}))
    bench_one("M=8 regions/group", CaptionerConfig(**FULL), M=8)
    bench_one("no fused attn", CaptionerConfig(**FULL), fused=False)
    bench_one("flat beam (no vocab_topk)", CaptionerConfig(**FULL),
              vocab_topk=False)
