"""On-chip fidelity check: vocab-topk fast-path beam vs the dense XLA
beam at the production shape (token match rate + score deltas).
"""
import sys; sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from vsrcic_tpu.models.api import ControllableCaptioner
from vsrcic_tpu.models.captioner import CaptionerConfig
cfg = CaptionerConfig(seq_len=20, vocab_size=10000, bos_idx=2,
                      det_feat_size=2048, input_encoding_size=1000,
                      rnn_size=1000, att_size=512)
key = jax.random.PRNGKey(0)
table = {str(i): [5 + i, 40 + i] for i in range(1, 200)}
flat = ControllableCaptioner(cfg, key=key, verb_2_vob_all=table)
topk = ControllableCaptioner(cfg, params=flat.params, verb_2_vob_all=table,
                             use_vocab_topk=True)
b = 32
kd, kg, kv = jax.random.split(key, 3)
dets = jax.random.normal(kd, (b, 50, 2048), jnp.float32)
groups = jax.random.normal(kg, (b, 10, 20, 2048), jnp.float32)
vl = jnp.where(jax.random.uniform(kv, (b, 10)) < 0.15,
               jax.random.randint(kv, (b, 10), 1, 150), -1).astype(jnp.int32)
rf = flat.beam_search_v(dets, groups, vl, eos_word=3, beam_size=5)
rt = topk.beam_search_v(dets, groups, vl, eos_word=3, beam_size=5)
wf, wt = np.asarray(rf.words), np.asarray(rt.words)
match = (wf == wt).mean()
print("token match: %.4f%%" % (100 * match))
print("score max abs diff:", float(np.abs(np.asarray(rf.scores) - np.asarray(rt.scores)).max()))
