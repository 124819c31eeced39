"""Bounded retry around transient TPU backend failures.

The axon tunnel occasionally fails backend init (or the first compile)
with ``UNAVAILABLE: TPU backend setup/compile error`` — a transient
condition that has cost driver bench captures in past rounds (BENCH_r03
rc=1, MULTICHIP_r01). This helper re-runs a whole attempt (device probe +
data staging + compile + run) after clearing jax's cached backend state,
with exponential backoff bounded to ~3 minutes total.

It retries only *exceptions* that look like transient init failures.
Hung tunnels (calls that never return) are handled by ``probe_backend``:
init is probed in a killable subprocess, a timeout with the relay process
still alive is classified transient (retryable), and a timeout with the
relay gone (``relay_alive``) fails permanently — nothing inside the VM
can restart a dead relay. Pass ``probe_timeout=`` to ``with_backend_retry``
to probe before each attempt.
"""
from __future__ import annotations

import sys
import time
from typing import Callable, TypeVar

T = TypeVar("T")

_TRANSIENT_MARKERS = (
    "UNAVAILABLE",
    "FAILED_PRECONDITION",
    "Unable to initialize backend",
    "backend setup/compile error",
)


def is_transient_backend_error(exc: BaseException) -> bool:
    msg = str(exc)
    return any(m in msg for m in _TRANSIENT_MARKERS)


def _clear_backend_cache() -> None:
    """Drop jax's cached (failed) backend so the next attempt re-inits."""
    try:
        from jax._src import xla_bridge

        xla_bridge._clear_backends()
    except Exception:  # pragma: no cover - best effort across jax versions
        pass


def relay_alive() -> bool:
    """True iff the axon tunnel relay process (.tpu_init.py) is running.

    The relay's stdio is wired to the host vsock orchestrator; once it
    dies it cannot be restarted from inside this VM, so clients hang
    forever. Scanning /proc cmdlines is side-effect-free (connecting to
    the relay's ports would emit open markers into the dead pipe).
    """
    import glob

    for p in glob.glob("/proc/[0-9]*/cmdline"):
        try:
            with open(p, "rb") as f:
                if b"tpu_init" in f.read():
                    return True
        except OSError:
            continue
    return False


def probe_backend(timeout: float = 120.0) -> str:
    """Probe backend init in a SUBPROCESS with a hard timeout.

    The axon tunnel has two distinct failure modes: transient init
    *errors* (retryable) and outright *hangs* — jax.devices() blocks in
    C++ forever (observed when the tunnel relay process dies mid-session).
    A hang in-process is unkillable from Python, so the probe runs in a
    child process that can be killed; a timeout is surfaced as a
    transient-classified RuntimeError so with_backend_retry treats both
    modes uniformly (bounded retries, then a clean nonzero exit instead of
    hanging the caller forever).

    Returns the probed platform name (e.g. "tpu"/"axon"/"cpu").
    """
    import subprocess

    code = ("import jax; d = jax.devices(); "
            "print(d[0].platform, flush=True)")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        import os
        # the dead-relay (permanent) classification only applies on hosts
        # that actually use the relay — elsewhere a probe timeout is just
        # a slow init and stays retryable
        if os.path.exists("/root/.tpu_init.py") and not relay_alive():
            # relay process gone: every client hangs and nothing inside
            # this VM can restart it — fail fast and permanently (NOT
            # transient-classified, so with_backend_retry won't burn
            # attempts x timeout on a dead tunnel)
            raise RuntimeError(
                "tpu tunnel relay process is dead (probe hung %.0fs, no "
                ".tpu_init.py in /proc) — unrecoverable from this VM"
                % timeout)
        raise RuntimeError(
            "UNAVAILABLE: backend init probe exceeded %.0fs (tunnel hang)"
            % timeout)
    if r.returncode != 0:
        tail = (r.stderr or r.stdout).strip().splitlines()
        raise RuntimeError("backend init probe failed (rc=%d): %s"
                           % (r.returncode, tail[-1] if tail else "?"))
    return r.stdout.strip().split()[-1]


def with_backend_retry(fn: Callable[[], T], *, attempts: int = 5,
                       base_delay: float = 5.0, label: str = "bench",
                       probe_timeout: float | None = None) -> T:
    """Run ``fn`` with bounded retries on transient backend errors.

    ``fn`` must be safe to re-run from scratch: each retry clears jax's
    backend cache, so any arrays created by a failed attempt are gone and
    the attempt must rebuild its own inputs. Backoff doubles per retry
    (5, 10, 20, 40 s => ~75 s of sleep across 5 attempts, plus attempt
    time, staying within the ~3 minute budget).

    probe_timeout: when set, probe backend init in a killable subprocess
    before each attempt — without it a HUNG tunnel blocks ``fn`` forever
    in-process (retries only help with errors, not hangs).
    """
    last: BaseException | None = None
    for i in range(attempts):
        try:
            if probe_timeout is not None:
                probe_backend(timeout=probe_timeout)
            return fn()
        except Exception as exc:  # noqa: BLE001 - filtered below
            if not is_transient_backend_error(exc) or i == attempts - 1:
                raise
            last = exc
            delay = base_delay * (2 ** i)
            first_line = str(exc).splitlines()[0] if str(exc) else repr(exc)
            print(f"[{label}] transient backend error (attempt {i + 1}/"
                  f"{attempts}): {first_line}; retrying in {delay:.0f}s",
                  file=sys.stderr, flush=True)
            _clear_backend_cache()
            time.sleep(delay)
    raise last  # pragma: no cover - loop always returns or raises
