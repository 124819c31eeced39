"""Sharded decode/training entry points over a device mesh.

Everything in the decode and train paths is batch-parallel, so scaling to a
pod slice is sharding annotations only: batch (and beam rows) ride the `data`
axis, params are replicated, and GSPMD inserts the collectives (the gradient
psum for training; none for decode). The v5e-8 throughput story is this
module + bench.py's per-chip number x 8.

The beam entry point uses `shard_map`, not bare GSPMD sharding annotations:
each device runs the complete single-chip beam program on its local batch
block — *including the Pallas fast-path kernels* (fused group attention,
streaming vocab top-k), which do not partition under GSPMD. The decode has
no cross-item dependencies, so no collectives are needed and per-chip
throughput is exactly the single-chip bench number.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # newer jax exports it at the top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def _vma_kwargs():
    """The replication-check kwarg was renamed (check_rep -> check_vma);
    pick whichever this jax accepts so both import paths actually work."""
    import inspect
    params = inspect.signature(_shard_map).parameters
    for name in ("check_vma", "check_rep"):
        if name in params:
            return {name: False}
    return {}


def sharded_beam_search_v(captioner, mesh: Mesh, detections, det_groups,
                          verb_list, eos_word: int, beam_size: int = 5,
                          gt: bool = False):
    """beam_search_v with the item batch sharded over mesh's data axis.

    The per-item batch must be divisible by the data-axis size (pad upstream).
    Returns the same BeamResult as the single-chip call, token-exact
    (tests/test_parallel.py).
    """
    import numpy as _np
    n = mesh.shape["data"]
    b = _np.shape(detections)[0]  # no device transfer just for the size
    if b % n:
        raise ValueError("batch %d not divisible by data axis %d" % (b, n))
    local_b = b // n

    tables = None
    if captioner.use_vocab_topk:
        # kernels are built for the LOCAL row count: inside shard_map the
        # trace sees per-device shapes, so each shard gets the same Pallas
        # program the single-chip path uses at that batch size
        tables = captioner._vocab_tables(
            captioner._vocab_topk_fn(local_b * beam_size, beam_size))

    def local_fn(params, det, groups, vl, vocab_tables):
        return captioner._beam_v_impl(params, det, groups, vl,
                                      beam_size=beam_size, eos_word=eos_word,
                                      gt=gt, vocab_tables=vocab_tables)

    fn = _shard_map(local_fn, mesh=mesh,
                    in_specs=(P(), P("data"), P("data"), P("data"), P()),
                    out_specs=P("data"), **_vma_kwargs())

    data = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    detections = jax.device_put(jnp.asarray(detections), data)
    det_groups = jax.device_put(jnp.asarray(det_groups), data)
    verb_list = jax.device_put(jnp.asarray(verb_list).astype(jnp.int32), data)
    params = jax.device_put(captioner.decode_params, rep)
    if tables is not None:
        tables = jax.device_put(tables, rep)
    return jax.jit(fn)(params, detections, det_groups, verb_list, tables)


def sharded_greedy(captioner, mesh: Mesh, detections, det_groups):
    data = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    fn = jax.jit(captioner._greedy_impl,
                 in_shardings=(rep, data, data), out_shardings=data)
    return fn(jax.device_put(captioner.decode_params, rep),
              jax.device_put(jnp.asarray(detections), data),
              jax.device_put(jnp.asarray(det_groups), data))
