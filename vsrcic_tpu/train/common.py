"""Shared training machinery: optimizers, schedules, train state."""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def adam(lr: float = 5e-4, grad_clip: Optional[float] = None
         ) -> optax.GradientTransformation:
    """torch.optim.Adam defaults (betas (0.9, 0.999), eps 1e-8) with a
    mutable learning rate (set_learning_rate / inject_hyperparams).
    grad_clip: elementwise clamp like the reference's (unused-upstream)
    clip_gradient helper (utils/tools.py:73)."""
    tx = optax.inject_hyperparams(optax.adam)(
        learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8)
    if grad_clip is not None:
        return optax.chain(optax.clip(grad_clip), tx)
    return tx


def set_learning_rate(opt_state, lr: float):
    """Mirror of the reference's set_lr (utils/tools.py:4)."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)
    return opt_state


def step_lr(base_lr: float, epoch: int, step_size: int = 3,
            gamma: float = 0.8) -> float:
    """torch StepLR schedule (ref train.py:78)."""
    return base_lr * (gamma ** (epoch // step_size))


def planner_lr(base_lr: float, epoch: int, decay_every: int = 3,
               decay_rate: float = 0.6) -> float:
    """The SSP scripts' manual decay (ref train_region_sort.py:117-120)."""
    if epoch >= 3:
        return base_lr * (decay_rate ** int((epoch - 3) // decay_every + 1))
    return base_lr


def init_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params, tx.init(params), jnp.asarray(0))


def apply_grads(tx, state: TrainState, grads) -> TrainState:
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1)


def nll_loss(log_probs, targets, ignore_index: Optional[int] = None):
    """Mean NLL over (optionally masked) targets — torch NLLLoss parity.

    log_probs: (..., C) log-probabilities; targets: (...) int.
    """
    flat_lp = log_probs.reshape(-1, log_probs.shape[-1])
    flat_t = targets.reshape(-1).astype(jnp.int32)
    picked = jnp.take_along_axis(
        flat_lp, jnp.clip(flat_t, 0, flat_lp.shape[-1] - 1)[:, None], 1)[:, 0]
    if ignore_index is None:
        return -jnp.mean(picked)
    mask = (flat_t != ignore_index).astype(log_probs.dtype)
    return -jnp.sum(picked * mask) / jnp.maximum(jnp.sum(mask), 1.0)
