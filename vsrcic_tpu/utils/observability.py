"""Tracing, metric logging and NaN guards (SURVEY.md §5 aux subsystems).

The reference has only tqdm postfix losses + optional tensorboardX scalars
(utils/tools.py:8-10) and pdb-on-NaN tripwires (sort_model.py:101-102). Here:

  * `MetricLogger` — structured scalar journal (JSONL) + optional
    TensorBoard event writing when `tensorboardX`/`tensorboard` is present,
    same scalar names as the reference ('train_loss', ...).
  * `trace` — context manager around jax.profiler for on-demand device
    traces (`VSRCIC_TRACE_DIR` or explicit path).
  * `check_finite` — host-side NaN/Inf guard mirroring the reference's
    tripwire, raising instead of dropping into pdb; `enable_nan_debug()`
    flips jax's debug_nans for in-jit localization.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional

import numpy as np


class MetricLogger:
    def __init__(self, log_dir: Optional[str] = None, name: str = "train"):
        self.log_dir = log_dir
        self.name = name
        self._jsonl = None
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, name + ".jsonl"), "a")
            try:
                from tensorboardX import SummaryWriter  # type: ignore
                self._tb = SummaryWriter(log_dir)
            except Exception:
                try:
                    from torch.utils.tensorboard import SummaryWriter
                    self._tb = SummaryWriter(log_dir)
                except Exception:
                    self._tb = None

    def add_scalar(self, key: str, value, iteration: int):
        value = float(value)
        if self._jsonl:
            self._jsonl.write(json.dumps(
                {"t": time.time(), "step": iteration, key: value}) + "\n")
            self._jsonl.flush()
        if self._tb:
            self._tb.add_scalar(key, value, iteration)

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()


@contextlib.contextmanager
def trace(trace_dir: Optional[str] = None):
    """jax.profiler trace context (no-op when no dir configured)."""
    trace_dir = trace_dir or os.environ.get("VSRCIC_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def check_finite(name: str, value) -> float:
    """Raise on NaN/Inf loss (reference pdb tripwire, sort_model.py:101)."""
    v = float(value)
    if not np.isfinite(v):
        raise FloatingPointError("non-finite %s: %r" % (name, v))
    return v


def enable_nan_debug(enable: bool = True):
    import jax
    jax.config.update("jax_debug_nans", enable)
