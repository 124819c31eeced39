"""Vocab-top-k fast path: kernel parity + candidate-beam exactness.

The candidate-based beam (decode/beam.beam_search_joint_candidates +
ops/vocab_topk) must select token-for-token the same beams as the dense flat
formulation — the exactness argument is in the beam docstring; these tests
check it empirically on random models including verb substitution, gt mode,
EOS freezing (short sequences force finished beams), and tie-heavy verb
seas.
"""
import numpy as np
import pytest

# heavyweight (~112s on a 1-core host) — excluded from the smoke tier,
# run via the full matrix: `python -m pytest tests/`
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from vsrcic_tpu.models.api import ControllableCaptioner
from vsrcic_tpu.models.captioner import CaptionerConfig
from vsrcic_tpu.ops.vocab_topk import make_vocab_topk_lse, vocab_topk_lse_xla

V, D, E, R, A = 30, 32, 24, 16, 8
T, B, M, L = 12, 4, 5, 6
BOS, EOS = 2, 3
VERB_TABLE = {"1": [5, 9, 11], "2": [7], "3": []}


@pytest.mark.parametrize("two_stage", [False, True])
def test_kernel_interpret_matches_xla_reference(two_stage):
    # NB with tile_v=128 / v=300 and two_stage, each lane position sees only
    # 3 candidates (< k=5), so the sentinel register slots are exercised
    rng = np.random.RandomState(0)
    rows, r, v, k = 16, 24, 300, 5
    h2 = jnp.asarray(rng.randn(rows, r).astype(np.float32))
    w_t = jnp.asarray(rng.randn(r, v).astype(np.float32))
    b = jnp.asarray(rng.randn(v).astype(np.float32))
    # duplicate columns -> value ties; lowest vocab id must win (lax.top_k)
    w_t = w_t.at[:, 10].set(w_t[:, 3])
    b = b.at[10].set(b[3])
    # a same-lane-position tie 128 columns apart (two-stage strict-> path)
    w_t = w_t.at[:, 170].set(w_t[:, 42])
    b = b.at[170].set(b[42])
    v1, i1, l1 = vocab_topk_lse_xla(h2, w_t, b, k)
    fn = make_vocab_topk_lse(rows, r, v, k, tile_v=128, interpret=True,
                             two_stage=two_stage)
    v2, i2, l2 = fn(h2, w_t, b)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5)


def test_kernel_two_stage_multi_chunk_matches_xla_reference():
    """tile_v=256 -> 2 chunks per tile: the in-tile chunk insert order and
    cross-chunk id monotonicity matter."""
    rng = np.random.RandomState(5)
    rows, r, v, k = 8, 16, 700, 5
    h2 = jnp.asarray(rng.randn(rows, r).astype(np.float32))
    w_t = jnp.asarray(rng.randn(r, v).astype(np.float32))
    b = jnp.asarray(rng.randn(v).astype(np.float32))
    for a, c in ((3, 3 + 128), (40, 40 + 256), (512, 512 + 128)):
        w_t = w_t.at[:, c].set(w_t[:, a])
        b = b.at[c].set(b[a])
    v1, i1, l1 = vocab_topk_lse_xla(h2, w_t, b, k)
    fn = make_vocab_topk_lse(rows, r, v, k, tile_v=256, interpret=True,
                             two_stage=True)
    v2, i2, l2 = fn(h2, w_t, b)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5)


def _make_captioners():
    cfg = CaptionerConfig(seq_len=T, vocab_size=V, bos_idx=BOS,
                          det_feat_size=D, input_encoding_size=E,
                          rnn_size=R, att_size=A)
    flat = ControllableCaptioner(cfg, key=jax.random.PRNGKey(0),
                                 verb_2_vob_all=VERB_TABLE)
    cand = ControllableCaptioner(cfg, params=flat.params,
                                 verb_2_vob_all=VERB_TABLE,
                                 use_vocab_topk="xla")
    return flat, cand


def _inputs(seed):
    rng = np.random.RandomState(seed)
    detections = rng.rand(B, 10, D).astype(np.float32)
    detections[:, 7:] = 0.0
    groups = rng.rand(B, L, M, D).astype(np.float32)
    groups[:, :, 4:] = 0.0
    verb_list = np.full((B, L), -1, np.int64)
    verb_list[0, 1] = 1
    verb_list[1, 2] = 2
    verb_list[2, 0] = 3     # empty tense list -> fallback word 0
    verb_list[3, 0] = 1     # verb in the FIRST group (t=0 substitution)
    return detections, groups, verb_list


@pytest.mark.parametrize("gt", [False, True])
@pytest.mark.parametrize("seed", [2, 7])
def test_candidate_beam_matches_flat(gt, seed):
    flat, cand = _make_captioners()
    detections, groups, verb_list = _inputs(seed)
    if gt:
        verb_list = np.where(verb_list > 0, 7, verb_list)
    for beam in (3, 5):
        rf = flat.beam_search_v(detections, groups, verb_list,
                                eos_word=EOS, beam_size=beam, gt=gt)
        rc = cand.beam_search_v(detections, groups, verb_list,
                                eos_word=EOS, beam_size=beam, gt=gt)
        np.testing.assert_array_equal(np.asarray(rc.words),
                                      np.asarray(rf.words))
        np.testing.assert_array_equal(np.asarray(rc.gates),
                                      np.asarray(rf.gates))
        np.testing.assert_allclose(np.asarray(rc.scores),
                                   np.asarray(rf.scores), rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(rc.word_logps),
                                   np.asarray(rf.word_logps), rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(rc.gate_logps),
                                   np.asarray(rf.gate_logps), rtol=1e-5,
                                   atol=1e-6)


def test_candidate_beam_matches_reference_torch():
    """End-to-end: candidate beam vs the actual reference torch beam."""
    torch = pytest.importorskip("torch")
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from reference_loader import load_reference_captioner
    from vsrcic_tpu.utils.torch_import import nest_state_dict
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        torch.manual_seed(0)
        ref = load_reference_captioner(
            td, verb_2_vob_all=VERB_TABLE, seq_len=T, vocab_size=V,
            bos_idx=BOS, det_feat_size=D, input_encoding_size=E,
            rnn_size=R, att_size=A)
    params = nest_state_dict(ref.state_dict())
    cfg = CaptionerConfig(seq_len=T, vocab_size=V, bos_idx=BOS,
                          det_feat_size=D, input_encoding_size=E,
                          rnn_size=R, att_size=A)
    cand = ControllableCaptioner(cfg, params=params,
                                 verb_2_vob_all=VERB_TABLE,
                                 use_vocab_topk="xla")
    detections, groups, verb_list = _inputs(11)
    beam = 3
    with torch.no_grad():
        outs_t, _ = ref.beam_search_v(
            (torch.tensor(detections), torch.tensor(groups),
             torch.tensor(verb_list.astype(np.float64))),
            eos_idxs=[EOS, -1], beam_size=beam, out_size=beam, gt=False)
    rc = cand.beam_search_v(detections, groups, verb_list,
                            eos_word=EOS, beam_size=beam)
    np.testing.assert_array_equal(np.asarray(rc.words), outs_t[0].numpy())
    np.testing.assert_array_equal(np.asarray(rc.gates), outs_t[1].numpy())


@pytest.mark.parametrize("two_stage", [False, True])
def test_kernel_row_blocking_matches(two_stage):
    """Multi-row-block grid (large batches exceed the 16MB scoped VMEM with
    a single block) must equal the reference."""
    rng = np.random.RandomState(2)
    rows, r, v, k = 24, 16, 260, 4
    h2 = jnp.asarray(rng.randn(rows, r).astype(np.float32))
    w_t = jnp.asarray(rng.randn(r, v).astype(np.float32))
    b = jnp.asarray(rng.randn(v).astype(np.float32))
    v1, i1, l1 = vocab_topk_lse_xla(h2, w_t, b, k)
    fn = make_vocab_topk_lse(rows, r, v, k, tile_v=128, tile_rows=8,
                             interpret=True, two_stage=two_stage)
    v2, i2, l2 = fn(h2, w_t, b)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5)


def test_vocab_tables_prepared_once_and_keyed_by_pad_shape(monkeypatch):
    """The facade must hand the kernel PREPARED (padded/cast) tables — not
    rely on the kernel wrapper's in-jit auto-pad fallback — and must
    re-prepare when the tile env vars change the padded vocab width."""
    cap = ControllableCaptioner(
        CaptionerConfig(seq_len=6, vocab_size=300, bos_idx=BOS,
                        det_feat_size=D, input_encoding_size=E,
                        rnn_size=R, att_size=A),
        key=jax.random.PRNGKey(0), verb_2_vob_all=VERB_TABLE,
        use_vocab_topk=True, pallas_interpret=True)
    # vocab 300: tile 128 -> v_pad 384, tile 256 -> v_pad 512 (distinct keys)
    rows = B * 3
    monkeypatch.setenv("VSRCIC_VOCAB_TILE", "128")
    fn = cap._vocab_topk_fn(rows, 5)
    w_p, b_p = cap._vocab_tables(fn)
    assert w_p.shape == (fn.r_pad, fn.v_pad)       # prepared, not raw (R, V)
    assert b_p.shape == (1, fn.v_pad)
    w_p2, b_p2 = cap._vocab_tables(fn)             # cached path
    assert w_p2 is w_p and b_p2 is b_p             # same prepared arrays
    assert cap._vocab_tables_cache[0] == ("pallas", fn.v_pad)

    monkeypatch.setenv("VSRCIC_VOCAB_TILE", "256")
    fn2 = cap._vocab_topk_fn(rows, 5)
    assert fn2.v_pad != fn.v_pad
    w_p2, _ = cap._vocab_tables(fn2)
    assert w_p2.shape == (fn2.r_pad, fn2.v_pad)    # re-prepared on key change


@pytest.mark.parametrize("gt", [False, True])
def test_candidate_beam_select_forms_bit_exact(gt):
    """The candidate beam's two joint-select forms — passenger-operand sort
    (the on-chip-faster default) vs position-iota sort + take_along gathers —
    must produce bit-identical BeamResults (ADVICE r4: the non-default
    iota+take form previously had only on-chip A/B coverage)."""
    cfg = CaptionerConfig(seq_len=T, vocab_size=V, bos_idx=BOS,
                          det_feat_size=D, input_encoding_size=E,
                          rnn_size=R, att_size=A)
    base = ControllableCaptioner(cfg, key=jax.random.PRNGKey(0),
                                 verb_2_vob_all=VERB_TABLE,
                                 use_vocab_topk="xla",
                                 beam_select_passenger=True)
    iota = ControllableCaptioner(cfg, params=base.params,
                                 verb_2_vob_all=VERB_TABLE,
                                 use_vocab_topk="xla",
                                 beam_select_passenger=False)
    detections, groups, verb_list = _inputs(13)
    for beam in (3, 5):
        rp = base.beam_search_v(detections, groups, verb_list,
                                eos_word=EOS, beam_size=beam, gt=gt)
        ri = iota.beam_search_v(detections, groups, verb_list,
                                eos_word=EOS, beam_size=beam, gt=gt)
        for field in rp._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(rp, field)),
                np.asarray(getattr(ri, field)), err_msg=field)
