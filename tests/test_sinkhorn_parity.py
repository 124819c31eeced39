"""Golden parity: Sinkhorn net vs the reference torch SinkhornNet."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vsrcic_tpu.models.sinkhorn import (
    SinkhornConfig, init_sinkhorn_params, sinkhorn_net_apply,
    sinkhorn_normalize)
from vsrcic_tpu.utils.torch_import import nest_state_dict

from reference_loader import load_reference_sinkhorn


@pytest.fixture(scope="module")
def ref_model():
    torch.manual_seed(0)
    return load_reference_sinkhorn(N=10, n_iters=20, tau=0.1)


def test_forward_matches(ref_model):
    cfg = SinkhornConfig(n=10, n_iters=20, tau=0.1)
    params = nest_state_dict(ref_model.state_dict())
    rng = np.random.RandomState(0)
    seq = rng.randn(3, 10, 2352).astype(np.float32)
    with torch.no_grad():
        out_t = ref_model(torch.tensor(seq))
    out_j = jax.jit(lambda s: sinkhorn_net_apply(params, cfg, s))(
        jnp.asarray(seq))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                               rtol=1e-4, atol=1e-6)


def test_doubly_stochastic_convergence():
    # kernel-level unit test from SURVEY.md §4: many iterations converge to a
    # doubly stochastic matrix
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 10, 10).astype(np.float32))
    p = sinkhorn_normalize(x, n_iters=200, tau=1.0)
    np.testing.assert_allclose(np.asarray(jnp.sum(p, -1)), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(jnp.sum(p, -2)), 1.0, atol=1e-3)


def test_init_shapes():
    cfg = SinkhornConfig()
    params = init_sinkhorn_params(jax.random.PRNGKey(0), cfg)
    assert params["W_fc"]["weight"].shape == (10, 256)
    out = sinkhorn_net_apply(params, cfg, jnp.zeros((2, 10, 2352)))
    assert out.shape == (2, 10, 10)
