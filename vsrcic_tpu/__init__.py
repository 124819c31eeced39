"""vsrcic_tpu — TPU-native framework for VSR-guided controllable image captioning.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
mad-red/VSR-guided-CIC (CVPR 2021, arXiv 2103.12204): verb/semantic-role
controlled image captioning with

  * an S-level SSP role-sequence planner (transformer pointer model),
  * an R-level SSP Sinkhorn permutation network for intra-role region order,
  * a role-shift two-LSTM captioning decoder with a joint (word x shift-gate)
    beam search,

plus the training stacks (XE, SCST CIDEr RL, planner trainers), a native
metrics suite (CIDEr/BLEU/ROUGE + PTB tokenizer), a packed feature store that
replaces per-example HDF5 reads, and `jax.sharding.Mesh`-based scaling.

Everything under `models/`, `decode/`, `ops/` is pure-functional JAX designed
for `jit`/`pjit`: static shapes, `lax.scan`/`lax.while_loop` control flow,
batched beam state resident in HBM.
"""

__version__ = "0.1.0"
