"""Demo: verb/role control changes the caption (X1 analog; the upstream demo
notebook is an empty stub).

Runs on the synthetic backend with a briefly-trained captioner, then decodes
the SAME image under two different control sequences to show the role-shift
decoder following the control plan.

    python examples/demo_control.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from vsrcic_tpu.data import (COCOControlSequenceField, DataLoader,
                             ImageDetectionsField, PairedDataset, RawField,
                             SyntheticCOCO)
from vsrcic_tpu.decode.loops import expand_compact_groups, greedy_decode
from vsrcic_tpu.models.captioner import (CaptionerConfig,
                                         init_captioner_params,
                                         precompute_statics)
from vsrcic_tpu.text import TextField, dedup_join
from vsrcic_tpu.train import CaptionerXETrainer

FEAT = 32

syn = SyntheticCOCO(n_images=48, n_val=4, n_test=4, feat_dim=FEAT, seed=0)
train, _, _ = syn.sample_splits
tf = TextField(fix_length=20)
tf.build_vocab([e.text for e in train], min_freq=1)

image_field = ImageDetectionsField(syn.store, max_detections=100)
det_field = COCOControlSequenceField(syn.store, classes_path=syn.classes,
                                     padding_idx=-1, all_boxes=False,
                                     fix_length=20, compact=True)
ds = PairedDataset(train, {"image": image_field, "detection": det_field,
                           "text": RawField()})
loader = DataLoader(ds, batch_size=16, shuffle=True)

cfg = CaptionerConfig(seq_len=20, vocab_size=len(tf.vocab), bos_idx=tf.bos_idx,
                      det_feat_size=FEAT, input_encoding_size=1000, rnn_size=1000,
                      att_size=512)
trainer = CaptionerXETrainer(cfg, init_captioner_params(jax.random.PRNGKey(0),
                                                        cfg), lr=3e-3)
print("training a tiny captioner on synthetic data ...")
for epoch in range(60):
    if epoch % 10 == 0:
        print("  (epoch %d)" % epoch)
    for (dets, _), (ids, gates, ids_test, _), caps in loader:
        loss, _, _ = trainer.step(dets, tf.process(list(caps)), ids, gates)
    pass

# two examples with different control plans over their own images
@jax.jit
def decode(params, dets, ids_test):
    groups = expand_compact_groups(dets, ids_test)
    statics = precompute_statics(params, cfg, dets, groups)
    return greedy_decode(params, cfg, statics)

(dets, _), (ids, gates, ids_test, cls_test), caps = next(iter(
    DataLoader(ds, batch_size=4)))
words, _ = decode(trainer.state.params, jnp.asarray(dets),
                  jnp.asarray(ids_test))
print("\ncontrolled generation (control plan -> caption):")
for i in range(4):
    plan = cls_test[i]
    raw = [tf.vocab.itos[int(w)] for w in np.asarray(words[i])]
    out = dedup_join(tf.decode(np.asarray(words[i]), join_words=False))
    print("  plan [%s] -> %r   (gt: %r)" % (plan, out, caps[i]))
    print("    raw: %s" % " ".join(raw[:10]))

# reverse each image's control plan: the decoder must mention the same
# classes in the REVERSED order — region-level controllability
rev = np.asarray(ids_test).copy()
rev[:, [0, 1]] = rev[:, [1, 0]]
words2, _ = decode(trainer.state.params, jnp.asarray(dets),
                   jnp.asarray(rev))
print("\nwith each image's region plan reversed:")
for i in range(4):
    out = dedup_join(tf.decode(np.asarray(words2[i]), join_words=False))
    print("  reversed plan [%s] -> %r"
          % (" ".join(reversed(cls_test[i].split())), out))
