"""ssp_generate_fast (KV-cached incremental decode) matches ssp_generate.

ssp_generate itself is golden-tested vs the reference torch model
(tests/test_ssp_parity.py), so agreement here transitively pins the
fast path to the reference semantics (ref sort_model.py:105-183), including
the degenerate all-masked-query cases the cache must special-case: every
row at t=0, rows with an empty role multiset, and rows that finish early.

Tokens are required EXACTLY equal; logprobs to 1e-5 — the math is identical
but GEMMs over (B,1,H) vs (B,S,H) accumulate in different order, so scores
can differ in the last ulp (same caveat as the repo's other fast paths).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

# heavyweight (~130s on a 1-core host) — excluded from the smoke tier,
# run via the full matrix: `python -m pytest tests/`
pytestmark = pytest.mark.slow

from vsrcic_tpu.models.s_ssp import (
    SSPConfig, init_ssp_params, ssp_generate, ssp_generate_fast)


def _cases(rng, b, l):
    det_sr = rng.randint(1, 26, (b, l)).astype(np.int32)
    det_sr[0, :] = 0              # empty multiset: inactive from step 0
    det_sr[1, 1:] = 0             # single role: finishes after one step
    det_sr[2, :] = det_sr[2, 0]   # all-duplicate roles: argmax tie-breaking
    det_sr[3, 5:] = 0             # mid-length multiset
    verb = rng.randint(1, 2662, (b, 1))
    return verb, det_sr


@pytest.mark.parametrize("mode", ["normal", "not-normal"])
def test_fast_generate_matches_full(mode):
    cfg = SSPConfig()
    params = init_ssp_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(7)
    for trial in range(3):
        verb, det_sr = _cases(rng, 8, cfg.max_len)
        pred_full, lps_full = jax.jit(
            lambda v, d: ssp_generate(params, cfg, v, d, mode=mode))(
                jnp.asarray(verb), jnp.asarray(det_sr))
        pred_fast, lps_fast = jax.jit(
            lambda v, d: ssp_generate_fast(params, cfg, v, d, mode=mode))(
                jnp.asarray(verb), jnp.asarray(det_sr))
        np.testing.assert_array_equal(np.asarray(pred_full),
                                      np.asarray(pred_fast))
        np.testing.assert_allclose(np.asarray(lps_full),
                                   np.asarray(lps_fast), atol=1e-5)


def test_fast_generate_trained_params_spread():
    """Non-init params (random but structured) + wide batch, both modes."""
    cfg = SSPConfig(dataset="flickr")
    params = init_ssp_params(jax.random.PRNGKey(3), cfg)
    # perturb all params so layer outputs are far from the init symmetry
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(5), len(leaves))
    leaves = [p + 0.3 * jax.random.normal(k, p.shape)
              for p, k in zip(leaves, keys)]
    params = jax.tree_util.tree_unflatten(treedef, leaves)

    rng = np.random.RandomState(11)
    b = 32
    det_sr = rng.randint(0, 26, (b, cfg.max_len)).astype(np.int32)
    verb = rng.randint(1, 2926, (b, 1)) + 10000 * rng.randint(0, 3, (b, 1))
    for mode in ("normal", "not-normal"):
        pf, lf = ssp_generate(params, cfg, jnp.asarray(verb),
                              jnp.asarray(det_sr), mode=mode)
        pq, lq = ssp_generate_fast(params, cfg, jnp.asarray(verb),
                                   jnp.asarray(det_sr), mode=mode)
        np.testing.assert_array_equal(np.asarray(pf), np.asarray(pq))
        # params are perturbed 0.3-sigma (large activations), so score
        # reassociation noise is amplified; tokens above are still exact
        np.testing.assert_allclose(np.asarray(lf), np.asarray(lq), atol=1e-3)


@pytest.mark.parametrize("fast", [False, True])
def test_truncated_scan_matches_full(fast):
    """n_steps >= the batch's max slot count is output-identical to the
    full-length constrained scan (steps past slot exhaustion write the init
    values) — the equivalence EvalPipeline._ssp_gen's bucketing rests on."""
    cfg = SSPConfig()
    params = init_ssp_params(jax.random.PRNGKey(1), cfg)
    gen = ssp_generate_fast if fast else ssp_generate
    rng = np.random.RandomState(23)
    b = 8
    det_sr = rng.randint(1, 26, (b, cfg.max_len)).astype(np.int32)
    det_sr[:, 4:] = 0             # max 4 slots per row
    det_sr[0, :] = 0
    det_sr[3, 2:] = 0
    verb = rng.randint(1, 2662, (b, 1))
    pf, lf = gen(params, cfg, jnp.asarray(verb), jnp.asarray(det_sr),
                 mode="not-normal")
    for n_steps in (4, 6):
        pt, lt = gen(params, cfg, jnp.asarray(verb), jnp.asarray(det_sr),
                     mode="not-normal", n_steps=n_steps)
        np.testing.assert_array_equal(np.asarray(pf), np.asarray(pt))
        np.testing.assert_allclose(np.asarray(lf), np.asarray(lt), atol=1e-5)
