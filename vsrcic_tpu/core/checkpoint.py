"""Checkpointing: one orbax format for every model + reference .pth import.

Replaces the reference's two ad-hoc schemes (captioner training dict
`{epoch, opt, val_cider, patience, best_cider, state_dict, optimizer,
scheduler}` -> *_best.pth/*_last.pth, reference coco_scripts/train.py:221-247;
planner `model[-tag].pth` + `infos[-tag].pkl` + `optimizer[-tag].pth`,
train_region_sort.py:42-54) with a single orbax PyTree checkpoint holding
{params, opt_state, step, meta}. `import_torch_state_dict` (utils) converts
released reference checkpoints into our params for eval parity.
"""
from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional

import numpy as np

logger = logging.getLogger("vsrcic_tpu.checkpoint")


def save_checkpoint(path: str, tree: Dict[str, Any]):
    """Save a pytree checkpoint (orbax if available, npz fallback).

    Only a missing/broken orbax *install* falls back to npz; an orbax
    *save error* with orbax present propagates — silently eating it would
    hide real bugs behind a format switch.
    """
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # host-numpy leaves: checkpoints must be mesh-agnostic — orbax records
    # leaf shardings, and a ckpt written from an N-device run would then
    # refuse to restore in a differently-meshed process (restore() passes
    # no shardings); np.asarray gathers sharded leaves to host
    try:
        import jax
        tree = jax.tree.map(lambda x: np.asarray(x), tree)
    except ImportError:
        pass
    try:
        import orbax.checkpoint as ocp
    except ImportError as e:
        logger.warning("orbax unavailable (%s); saving npz fallback to %s",
                       e, path)
        _save_npz(path, tree)
        return
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree, force=True)


def restore_checkpoint(path: str) -> Dict[str, Any]:
    path = os.path.abspath(path)
    if os.path.isdir(path):
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        tree = ckptr.restore(path)
    else:
        tree = _load_npz(path)
    # normalize leaves to device arrays: restored params must behave like
    # initialized ones — a raw numpy leaf silently works until a jitted
    # consumer indexes it BY a tracer (numpy intercepts __getitem__ and
    # tries to concretize the index; caught by the 3-ckpt eval CLI test).
    # Non-numeric leaves (e.g. strings in the saved cfg block) stay host.
    import jax
    import jax.numpy as jnp

    def _to_device(x):
        a = np.asarray(x)
        return jnp.asarray(a) if a.dtype.kind in "biufc" else x

    return jax.tree_util.tree_map(_to_device, tree)


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + str(k) + "/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, prefix + "#%d/" % i))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _save_npz(path: str, tree):
    flat = _flatten(tree)
    np.savez(path if path.endswith(".npz") else path + ".npz", **flat)


def _load_npz(path: str):
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path, allow_pickle=False)
    out: Dict[str, Any] = {}
    for key in data.files:
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return out


class CheckpointManager:
    """best/last rotation with a metrics journal (reference scheme parity:
    best-checkpoint on val CIDEr, patience counter — train.py:237-251)."""

    def __init__(self, root: str, name: str):
        self.root = root
        self.name = name
        os.makedirs(root, exist_ok=True)
        self._meta_path = os.path.join(root, name + "_meta.json")
        self.meta = {"best_metric": -float("inf"), "patience": 0, "epoch": -1}
        if os.path.isfile(self._meta_path):
            with open(self._meta_path) as f:
                self.meta = json.load(f)

    def step(self, tree: Dict[str, Any], metric: float, epoch: int,
             patience_limit: int = 5) -> bool:
        """Save last (+best if improved). Returns True when patience exhausted."""
        self.meta["epoch"] = epoch
        if metric >= self.meta["best_metric"]:
            self.meta["best_metric"] = metric
            self.meta["patience"] = 0
            save_checkpoint(os.path.join(self.root, self.name + "_best"), tree)
        else:
            self.meta["patience"] += 1
        save_checkpoint(os.path.join(self.root, self.name + "_last"), tree)
        with open(self._meta_path, "w") as f:
            json.dump(self.meta, f)
        return self.meta["patience"] >= patience_limit

    def restore(self, best: bool = True) -> Optional[Dict[str, Any]]:
        tag = "_best" if best else "_last"
        path = os.path.join(self.root, self.name + tag)
        if os.path.isdir(path) or os.path.isfile(path + ".npz"):
            return restore_checkpoint(path)
        return None
