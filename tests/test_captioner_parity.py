"""Golden parity: JAX role-shift captioner vs the reference torch model.

The actual reference modules (read-only, /root/reference) run on CPU torch;
weights are copied into the JAX pytree (layouts match), then forward /
greedy / beam outputs are compared.
"""
import numpy as np
import pytest

# heavyweight (~32s on a 1-core host) — excluded from the smoke tier,
# run via the full matrix: `python -m pytest tests/`
pytestmark = pytest.mark.slow
import torch

import jax
import jax.numpy as jnp

from vsrcic_tpu.models.captioner import (
    CaptionerConfig, VerbTenseTable, init_captioner_params, init_state,
    precompute_statics, captioner_step_v,
)
from vsrcic_tpu.decode.loops import (
    forward_teacher_forcing, greedy_decode, sample_decode)
from vsrcic_tpu.decode.beam import beam_search_joint
from vsrcic_tpu.utils.torch_import import nest_state_dict

from reference_loader import load_reference_captioner

V, D, E, R, A = 30, 32, 24, 16, 8   # vocab, det_feat, embed, rnn, att
T, B, M, L = 12, 4, 5, 6            # seq_len, batch, max_det, n_groups
BOS = 2
EOS = 3

VERB_TABLE = {"1": [5, 9, 11], "2": [7], "3": []}


@pytest.fixture(scope="module")
def ref_model(tmp_path_factory):
    torch.manual_seed(0)
    return load_reference_captioner(
        tmp_path_factory.mktemp("ref"), verb_2_vob_all=VERB_TABLE,
        seq_len=T, vocab_size=V, bos_idx=BOS, det_feat_size=D,
        input_encoding_size=E, rnn_size=R, att_size=A)


@pytest.fixture(scope="module")
def cfg():
    return CaptionerConfig(seq_len=T, vocab_size=V, bos_idx=BOS,
                           det_feat_size=D, input_encoding_size=E,
                           rnn_size=R, att_size=A)


@pytest.fixture(scope="module")
def params(ref_model):
    return nest_state_dict(ref_model.state_dict())


def make_inputs(seed=0):
    rng = np.random.RandomState(seed)
    detections = rng.rand(B, 10, D).astype(np.float32)
    detections[:, 7:] = 0.0  # padded rows
    captions = rng.randint(0, V, size=(B, T)).astype(np.int64)
    ctrl = rng.rand(B, T, M, D).astype(np.float32)
    ctrl[:, :, 3:] = 0.0     # padded regions within each group
    groups = rng.rand(B, L, M, D).astype(np.float32)
    groups[:, :, 4:] = 0.0
    return detections, captions, ctrl, groups


def test_teacher_forcing_matches(ref_model, cfg, params):
    detections, captions, ctrl, _ = make_inputs()
    with torch.no_grad():
        out_t, gate_t = ref_model(
            (torch.tensor(detections),),
            (torch.tensor(captions), torch.tensor(ctrl)))
    out_j, gate_j = jax.jit(
        lambda d, c, s: forward_teacher_forcing(params, cfg, d, c, s)
    )(jnp.asarray(detections), jnp.asarray(captions), jnp.asarray(ctrl))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gate_j), gate_t.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_greedy_matches(ref_model, cfg, params):
    detections, _, _, groups = make_inputs(1)
    with torch.no_grad():
        words_t, gates_t = ref_model.test(
            torch.tensor(detections), torch.tensor(groups))
    statics = precompute_statics(params, cfg, jnp.asarray(detections),
                                 jnp.asarray(groups))
    words_j, gates_j = jax.jit(
        lambda s: greedy_decode(params, cfg, s))(statics)
    np.testing.assert_array_equal(np.asarray(words_j), words_t.numpy())
    np.testing.assert_array_equal(np.asarray(gates_j), gates_t.numpy())


def _jax_beam_v(params, cfg, detections, groups, verb_list, tense_table,
                beam, gt=False):
    b = detections.shape[0]
    statics = precompute_statics(
        params, cfg, jnp.asarray(detections), jnp.asarray(groups),
        verb_list=jnp.asarray(verb_list))

    def step_fn(state, prev_word, prev_gate, t0):
        return captioner_step_v(params, cfg, state, statics, tense_table,
                                prev_word=prev_word, prev_gate=prev_gate,
                                t0=t0, gt=gt, beam=beam)

    return beam_search_joint(step_fn, init_state(cfg, b * beam), b, beam,
                             cfg.seq_len, eos_word=EOS, eos_gate=-1)


def test_beam_search_v_matches(ref_model, cfg, params):
    beam = 3
    detections, _, _, groups = make_inputs(2)
    rng = np.random.RandomState(7)
    # verb slots: mostly -1, some verb ids present in VERB_TABLE
    verb_list = np.full((B, L), -1, np.int64)
    verb_list[0, 1] = 1
    verb_list[1, 2] = 2
    verb_list[2, 0] = 3   # empty tense list -> fallback word 0
    with torch.no_grad():
        outs_t, logps_t = ref_model.beam_search_v(
            (torch.tensor(detections), torch.tensor(groups),
             torch.tensor(verb_list.astype(np.float64))),
            eos_idxs=[EOS, -1], beam_size=beam, out_size=beam, gt=False)

    ids = np.full((4, 3), -1, np.int32)
    for k, v in VERB_TABLE.items():
        ids[int(k), :len(v)] = v
    table = VerbTenseTable(jnp.asarray(ids))
    res = jax.jit(lambda d, g, vl: _jax_beam_v(
        params, cfg, d, g, vl, table, beam))(
        jnp.asarray(detections), jnp.asarray(groups), jnp.asarray(verb_list))

    np.testing.assert_array_equal(np.asarray(res.words), outs_t[0].numpy())
    np.testing.assert_array_equal(np.asarray(res.gates), outs_t[1].numpy())
    np.testing.assert_allclose(np.asarray(res.word_logps),
                               logps_t[0].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.gate_logps),
                               logps_t[1].numpy(), rtol=1e-4, atol=1e-5)


def test_sample_decode_shapes_and_logps(cfg, params):
    detections, _, _, groups = make_inputs(3)
    statics = precompute_statics(params, cfg, jnp.asarray(detections),
                                 jnp.asarray(groups))
    (words, gates), (wlp, glp) = jax.jit(
        lambda s, k: sample_decode(params, cfg, s, k)
    )(statics, jax.random.PRNGKey(0))
    assert words.shape == (B, T) and gates.shape == (B, T)
    assert np.all(np.asarray(wlp) <= 0) and np.all(np.asarray(glp) <= 0)
    assert set(np.unique(np.asarray(gates))) <= {0, 1}


def test_beam_search_plain_matches(ref_model, cfg, params):
    """Non-verb beam_search (ref CaptioningModel.beam_search :116-195)."""
    from vsrcic_tpu.models.captioner import captioner_step
    beam = 3
    detections, _, _, groups = make_inputs(5)
    with torch.no_grad():
        outs_t, logps_t = ref_model.beam_search(
            (torch.tensor(detections), torch.tensor(groups)),
            eos_idxs=[EOS, -1], beam_size=beam, out_size=beam)

    statics = precompute_statics(params, cfg, jnp.asarray(detections),
                                 jnp.asarray(groups))

    def step_fn(state, pw, pg, t0):
        return captioner_step(params, cfg, state, statics, prev_word=pw,
                              prev_gate=pg, t0=t0, beam=beam)

    res = jax.jit(lambda: beam_search_joint(
        step_fn, init_state(cfg, B * beam), B, beam, cfg.seq_len,
        eos_word=EOS))()
    np.testing.assert_array_equal(np.asarray(res.words), outs_t[0].numpy())
    np.testing.assert_array_equal(np.asarray(res.gates), outs_t[1].numpy())
    np.testing.assert_allclose(np.asarray(res.word_logps),
                               logps_t[0].numpy(), rtol=1e-4, atol=1e-5)
