"""Observability utils: metric journal, NaN guard, trace no-op."""
import json
import os

import numpy as np
import pytest

from vsrcic_tpu.utils.observability import (MetricLogger, check_finite,
                                            trace)


def test_metric_logger_jsonl(tmp_path):
    log = MetricLogger(str(tmp_path), name="t")
    log.add_scalar("train_loss", 1.5, 0)
    log.add_scalar("train_loss", 1.2, 1)
    log.close()
    lines = [json.loads(l) for l in open(tmp_path / "t.jsonl")]
    assert lines[0]["train_loss"] == 1.5 and lines[1]["step"] == 1


def test_metric_logger_disabled():
    log = MetricLogger(None)
    log.add_scalar("x", 1.0, 0)  # no-op, no crash
    log.close()


def test_check_finite():
    assert check_finite("loss", 1.0) == 1.0
    with pytest.raises(FloatingPointError):
        check_finite("loss", float("nan"))
    with pytest.raises(FloatingPointError):
        check_finite("loss", np.inf)


def test_trace_noop():
    with trace(None):
        pass
