"""Unit tests for the transient-backend retry wrapper (utils/retry.py).

Motivated by BENCH_r03: the driver's bench capture died at a single
``jax.devices()`` call on a transient ``UNAVAILABLE`` init error. The
wrapper must retry exactly that class of error, bounded, and nothing else.
"""
import pytest

from vsrcic_tpu.utils.retry import is_transient_backend_error, with_backend_retry


def test_transient_error_is_retried(monkeypatch):
    monkeypatch.setattr("time.sleep", lambda s: None)
    calls = []

    def fn():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError(
                "Unable to initialize backend 'axon': UNAVAILABLE: "
                "TPU backend setup/compile error (Unavailable).")
        return "ok"

    assert with_backend_retry(fn, attempts=5) == "ok"
    assert len(calls) == 3


def test_non_transient_error_raises_immediately():
    calls = []

    def fn():
        calls.append(1)
        raise ValueError("shape mismatch")

    with pytest.raises(ValueError):
        with_backend_retry(fn, attempts=5)
    assert len(calls) == 1


def test_attempts_exhausted_raises_last(monkeypatch):
    monkeypatch.setattr("time.sleep", lambda s: None)
    calls = []

    def fn():
        calls.append(1)
        raise RuntimeError("UNAVAILABLE: flaky")

    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        with_backend_retry(fn, attempts=3, base_delay=0.0)
    assert len(calls) == 3


def test_marker_classification():
    assert is_transient_backend_error(RuntimeError("FAILED_PRECONDITION: x"))
    assert is_transient_backend_error(
        RuntimeError("TPU backend setup/compile error (Unavailable)"))
    assert not is_transient_backend_error(RuntimeError("XlaRuntimeError: "
                                                       "invalid argument"))


def test_probe_backend_timeout_is_transient(monkeypatch):
    import subprocess

    from vsrcic_tpu.utils import retry as retry_mod

    def fake_run(*a, **kw):
        raise subprocess.TimeoutExpired(cmd="python", timeout=kw["timeout"])

    monkeypatch.setattr(subprocess, "run", fake_run)
    # relay alive + probe hang -> transient (slow/flaky tunnel, retry)
    monkeypatch.setattr(retry_mod, "relay_alive", lambda: True)
    with pytest.raises(RuntimeError) as ei:
        retry_mod.probe_backend(timeout=0.01)
    assert is_transient_backend_error(ei.value)


def test_probe_backend_dead_relay_is_permanent(monkeypatch):
    """Relay process gone + probe hang -> NON-transient: with_backend_retry
    must fail fast instead of burning attempts x timeout on a tunnel no one
    inside the VM can restart (validated against the real dead tunnel)."""
    import subprocess

    from vsrcic_tpu.utils import retry as retry_mod

    def fake_run(*a, **kw):
        raise subprocess.TimeoutExpired(cmd="python", timeout=kw["timeout"])

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(retry_mod, "relay_alive", lambda: False)
    import os.path
    monkeypatch.setattr(os.path, "exists", lambda p: True)  # relay host
    with pytest.raises(RuntimeError) as ei:
        retry_mod.probe_backend(timeout=0.01)
    assert not is_transient_backend_error(ei.value)
    assert "unrecoverable" in str(ei.value)


def test_probe_backend_failure_propagates(monkeypatch):
    import subprocess

    from vsrcic_tpu.utils import retry as retry_mod

    class R:
        returncode = 1
        stdout = ""
        stderr = "RuntimeError: Unable to initialize backend 'axon': UNAVAILABLE"

    monkeypatch.setattr(subprocess, "run", lambda *a, **kw: R())
    with pytest.raises(RuntimeError) as ei:
        retry_mod.probe_backend(timeout=1.0)
    assert is_transient_backend_error(ei.value)


def test_probe_backend_success(monkeypatch):
    import subprocess

    from vsrcic_tpu.utils import retry as retry_mod

    class R:
        returncode = 0
        stdout = "cpu\n"
        stderr = ""

    monkeypatch.setattr(subprocess, "run", lambda *a, **kw: R())
    assert retry_mod.probe_backend(timeout=1.0) == "cpu"
