"""Test config: run JAX on a virtual 8-device CPU mesh (no TPU needed).

Mirrors the multi-chip test strategy from SURVEY.md §4: sharding/pjit code is
exercised with XLA's host-platform device-count override.

NB: this environment preloads jax with a TPU ('axon') platform via
sitecustomize, so env vars are too late — we must force the platform through
jax.config before any backend is used.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# fp32 matmuls must be exact on any backend for golden parity tests
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
