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
