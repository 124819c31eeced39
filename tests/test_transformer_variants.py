"""Golden parity for the upstream-dead M6 transformer variants
(VERDICT missing #5): relative-position MultiHeadAttention
(ref transformer_modules.py:67-147), TemporalMasking (:247-269), and the
generic incremental TransformerDecoderLayer (:347-386)."""
import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")
from vsrcic_tpu.models.transformer import (generic_decoder_layer_apply,
                                           mha_apply, temporal_mask)
from vsrcic_tpu.utils.torch_import import nest_state_dict

_spec = importlib.util.spec_from_file_location(
    "ref_tm", "/root/reference/models/transformer_modules.py")
ref_tm = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ref_tm)

SIZE, HEADS = 32, 8
B, TQ, TK = 3, 6, 9


def test_relative_pos_mha_parity():
    torch.manual_seed(0)
    ref = ref_tm.MultiHeadAttention(SIZE, num_head=HEADS, relative_pos=True)
    ref.eval()
    params = nest_state_dict(ref.state_dict())
    rng = np.random.RandomState(0)
    q = rng.randn(B, TQ, SIZE).astype(np.float32)
    k = rng.randn(B, TK, SIZE).astype(np.float32)
    mask = (rng.rand(B, TQ, TK) > 0.2).astype(np.float32)
    with torch.no_grad():
        out_t, _ = ref(torch.tensor(q), torch.tensor(k), torch.tensor(k),
                       mask=torch.tensor(mask))
    out_j = mha_apply(params, jnp.asarray(q), jnp.asarray(k), jnp.asarray(k),
                      mask=jnp.asarray(mask)[:, None], n_heads=HEADS)
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_temporal_masking_parity():
    ref = ref_tm.TemporalMasking(max_len=50)
    x = torch.zeros(2, 7, SIZE)
    np.testing.assert_array_equal(np.asarray(temporal_mask(7)),
                                  ref(x).numpy())
    np.testing.assert_array_equal(
        np.asarray(temporal_mask(np.zeros((2, 7, SIZE)))), ref(7).numpy())


@pytest.mark.parametrize("last_only", [False, True])
def test_generic_decoder_layer_parity(last_only):
    torch.manual_seed(1)
    ref = ref_tm.TransformerDecoderLayer(SIZE, n_att_head=HEADS)
    ref.eval()
    params = nest_state_dict(ref.state_dict())
    rng = np.random.RandomState(1)
    enc = rng.randn(B, TK, SIZE).astype(np.float32)
    dec = rng.randn(B, TQ, SIZE).astype(np.float32)
    tgt_mask = np.asarray(temporal_mask(TQ))
    if last_only:
        tgt_mask = tgt_mask[:, -1:, :]
    with torch.no_grad():
        out_t = ref(torch.tensor(enc), torch.tensor(dec),
                    tgt_mask=torch.tensor(tgt_mask), last_only=last_only)
    out_j = generic_decoder_layer_apply(
        params, jnp.asarray(enc), jnp.asarray(dec),
        tgt_mask=jnp.asarray(tgt_mask)[:, None], n_heads=HEADS,
        last_only=last_only)
    assert out_j.shape == tuple(out_t.shape)
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                               rtol=1e-4, atol=1e-5)
