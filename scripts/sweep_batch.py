"""Batch-size sweep at the fast config (post-megakernel balance)."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from vsrcic_tpu.models.api import ControllableCaptioner
from vsrcic_tpu.models.captioner import CaptionerConfig

cfg = CaptionerConfig(seq_len=20, vocab_size=10000, bos_idx=2,
                      det_feat_size=2048, input_encoding_size=1000,
                      rnn_size=1000, att_size=512)
for batch in (128, 256, 512, 1024):
    cap = ControllableCaptioner(
        cfg, key=jax.random.PRNGKey(0),
        verb_2_vob_all={str(i): [5 + i, 40 + i] for i in range(1, 200)},
        use_fused_attention=True, table_dtype=jnp.bfloat16,
        use_vocab_topk=True)
    kd, kg, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    dets = jax.random.normal(kd, (batch, 50, 2048))
    groups = jax.random.normal(kg, (batch, 10, 20, 2048))
    vl = jnp.where(jax.random.uniform(kv, (batch, 10)) < 0.15,
                   jax.random.randint(kv, (batch, 10), 1, 150),
                   -1).astype(jnp.int32)
    run = lambda: cap.beam_search_v(dets, groups, vl, eos_word=3,
                                    beam_size=5).words.block_until_ready()
    run()
    n = 6
    t0 = time.perf_counter()
    for _ in range(n): run()
    dt = (time.perf_counter() - t0) / n
    print("batch %5d: %7.1f caps/s (%.1f ms/batch)"
          % (batch, batch / dt, dt * 1e3), flush=True)
