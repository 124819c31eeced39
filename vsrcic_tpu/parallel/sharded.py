"""Sharded decode/training entry points over a device mesh.

Everything in the decode and train paths is batch-parallel, so scaling to a
pod slice is sharding annotations only: batch (and beam rows) ride the `data`
axis, params are replicated, and GSPMD inserts the collectives (the gradient
psum for training; none for decode). The v5e-8 throughput story is this
module + bench.py's per-chip number x 8.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sharded_beam_search_v(captioner, mesh: Mesh, detections, det_groups,
                          verb_list, eos_word: int, beam_size: int = 5,
                          gt: bool = False):
    """beam_search_v with the item batch sharded over mesh's data axis.

    The per-item batch must be divisible by the data-axis size (pad upstream).
    Returns the same BeamResult as the single-chip call.
    """
    data = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    detections = jax.device_put(jnp.asarray(detections), data)
    det_groups = jax.device_put(jnp.asarray(det_groups), data)
    verb_list = jax.device_put(jnp.asarray(verb_list).astype(jnp.int32), data)
    params = jax.device_put(captioner.decode_params, rep)

    tables = None
    if captioner.use_vocab_topk:
        # the candidate beam's out_fc tables ride replicated; NB the Pallas
        # kernel doesn't partition under GSPMD — use use_vocab_topk='xla'
        # (any-backend candidate beam) for sharded decode
        tables = jax.device_put(captioner._vocab_tables(
            captioner._vocab_topk_fn(detections.shape[0] * beam_size,
                                     beam_size)), rep)

    def impl(params, detections, det_groups, verb_list, vocab_tables):
        return captioner._beam_v_impl(params, detections, det_groups,
                                      verb_list, beam_size=beam_size,
                                      eos_word=eos_word, gt=gt,
                                      vocab_tables=vocab_tables)

    fn = jax.jit(impl, in_shardings=(rep, data, data, data, rep),
                 out_shardings=data)
    return fn(params, detections, det_groups, verb_list, tables)


def sharded_greedy(captioner, mesh: Mesh, detections, det_groups):
    data = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    fn = jax.jit(captioner._greedy_impl,
                 in_shardings=(rep, data, data), out_shardings=data)
    return fn(jax.device_put(captioner.decode_params, rep),
              jax.device_put(jnp.asarray(detections), data),
              jax.device_put(jnp.asarray(det_groups), data))
