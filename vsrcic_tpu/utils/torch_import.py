"""Import released PyTorch ``.pth`` checkpoints into JAX param pytrees.

Because `vsrcic_tpu.core.nn` keeps torch parameter layout (Linear weights are
``(out, in)``, LSTM gates packed i,f,g,o), a reference state_dict maps onto
our params by pure key nesting — no transposes. Covers the reference
checkpoint schemes: the captioner's full training dict with ``state_dict``
inside (reference coco_scripts/train.py:221-230) and the bare
``model-tr.pth`` / ``model-sh.pth`` planner state dicts
(train_region_sort.py:42-54).
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def nest_state_dict(flat: Mapping[str, Any]) -> Dict[str, Any]:
    """{'a.b.weight': t} -> {'a': {'b': {'weight': jnp array}}}."""
    import jax.numpy as jnp

    out: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split(".")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if hasattr(val, "detach"):  # torch tensor
            val = val.detach().cpu().numpy()
        node[parts[-1]] = jnp.asarray(np.asarray(val))
    return out


def import_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load a .pth file; unwrap a training dict's ``state_dict`` if present."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "state_dict" in blob:
        blob = blob["state_dict"]
    return nest_state_dict(blob)
