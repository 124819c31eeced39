"""Beam-search helper regressions (decode/beam.py internals)."""


def test_gather_beam_flat_matches_take_along(monkeypatch):
    """Both _gather_beam forms (flat global-row gather, the default, and
    the reshape+take_along_axis fallback) must reindex identically."""
    import numpy as np
    import jax.numpy as jnp
    from vsrcic_tpu.decode import beam as beam_mod

    rng = np.random.RandomState(0)
    batch, k = 3, 4
    tree = {
        "h": jnp.asarray(rng.randn(batch * k, 7).astype(np.float32)),
        "ptr": jnp.asarray(rng.randint(0, 5, size=(batch * k,))),
        "g3": jnp.asarray(rng.randn(batch * k, 2, 5).astype(np.float32)),
    }
    sel = jnp.asarray(rng.randint(0, k, size=(batch, k)))
    flat = beam_mod._gather_beam(tree, sel, batch, k, take_along=False)
    ta = beam_mod._gather_beam(tree, sel, batch, k, take_along=True)
    for key in tree:
        np.testing.assert_array_equal(np.asarray(flat[key]),
                                      np.asarray(ta[key]))


import pytest


@pytest.mark.slow  # ~45s: four full-beam jit compiles on CPU
def test_rec_flat_bit_exact(monkeypatch):
    """The flat logprob-record form (rec_flat=True: one (beam*V) gather +
    mask on the K selected values) returns a BeamResult identical to the
    nested take_along form over a pre-masked (B, K, V) block — the operand
    pairs of every multiply are the same, so this must be BIT-exact.
    Exercised through the full ControllableCaptioner dense beam (step and
    step_v), long enough sequences for EOS masks + finished-beam freeze to
    engage."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from vsrcic_tpu.models.api import ControllableCaptioner
    from vsrcic_tpu.models.captioner import CaptionerConfig

    cfg = CaptionerConfig(seq_len=8, vocab_size=30, bos_idx=2,
                          det_feat_size=12, input_encoding_size=10,
                          rnn_size=9, att_size=6)
    key = jax.random.PRNGKey(3)
    kd, kg = jax.random.split(key)
    B, L, M, N = 3, 4, 5, 6
    dets = jax.random.normal(kd, (B, N, cfg.det_feat_size), jnp.float32)
    groups = jax.random.normal(kg, (B, L, M, cfg.det_feat_size), jnp.float32)
    verbs = jnp.array([[1, -1, 2, -1]] * B, jnp.int32)
    tbl = {str(i): [5 + i, 20 + i] for i in range(1, 4)}

    results = []
    for flat in ("0", "1"):
        monkeypatch.setenv("VSRCIC_REC_FLAT", flat)
        cap = ControllableCaptioner(cfg, key=jax.random.PRNGKey(0),
                                    verb_2_vob_all=tbl)
        assert cap.beam_rec_flat is (flat == "1")
        r = cap.beam_search_v(dets, groups, verbs, eos_word=3, beam_size=3)
        r2 = cap.beam_search(dets, groups, eos_word=3, beam_size=3)
        results.append((r, r2))
    for a, b in zip(results[0], results[1]):
        for fa, fb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))
