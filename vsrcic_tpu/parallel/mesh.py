"""Device mesh + sharding helpers.

The reference is single-GPU with zero distributed support (SURVEY.md §2.5);
scaling here is a native design choice: a `jax.sharding.Mesh` with a `data`
axis (batch parallel over ICI; beam x batch decode shards the same way) and
an optional `model` axis kept in the types so larger models / tensor
parallelism slot in without API changes. Collectives are inserted by GSPMD
from sharding annotations — no hand-written NCCL-style code.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Host batch pytree -> device arrays sharded on the data axis.

    Pads the leading dim up to a multiple of the data-axis size (trainers
    mask padded rows via their loss masks).
    """
    n = mesh.shape["data"]
    sh = data_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        pad = (-x.shape[0]) % n
        if pad:
            x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)], 0)
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
