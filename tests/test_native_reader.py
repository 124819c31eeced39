"""Native C++ packed-store reader vs numpy fallback."""
import numpy as np
import pytest

from vsrcic_tpu.data.native_reader import (fill_padded_batch, native_available)


def test_fill_padded_batch_matches_fallback():
    rng = np.random.RandomState(0)
    src = rng.rand(100, 16).astype(np.float32)
    starts = [0, 10, 50, 95]
    counts = [10, 40, 30, 5]
    out = fill_padded_batch(src, starts, counts, max_rows=20)
    assert out.shape == (4, 20, 16)
    np.testing.assert_array_equal(out[0, :10], src[0:10])
    assert np.all(out[0, 10:] == 0)
    np.testing.assert_array_equal(out[1], src[10:30])  # truncated to 20
    np.testing.assert_array_equal(out[3, :5], src[95:100])
    assert np.all(out[3, 5:] == 0)


def test_native_lib_builds_and_loads():
    if not native_available():
        pytest.skip("native toolchain unavailable")
    # large batch to exercise the threaded path
    rng = np.random.RandomState(1)
    src = rng.rand(5000, 32).astype(np.float32)
    starts = list(range(0, 5000, 50))
    counts = [50] * len(starts)
    out = fill_padded_batch(src, starts, counts, max_rows=64, nthreads=4)
    for i, s in enumerate(starts[:5]):
        np.testing.assert_array_equal(out[i, :50], src[s:s + 50])
        assert np.all(out[i, 50:] == 0)


def test_batch_features_from_packed_store(tmp_path):
    import h5py
    from vsrcic_tpu.data import PackedFeatureStore
    from vsrcic_tpu.data.native_reader import batch_features
    rng = np.random.RandomState(2)
    h5 = tmp_path / "d.hdf5"
    with h5py.File(h5, "w") as f:
        for i, n in [(1, 5), (2, 8)]:
            f["%d_cls_prob" % i] = rng.rand(n, 4).astype(np.float32)
            f["%d_features" % i] = rng.rand(n, 16).astype(np.float32)
            f["%d_boxes" % i] = rng.rand(n, 4).astype(np.float32)
    store = PackedFeatureStore.convert_hdf5(str(h5), str(tmp_path / "p"))
    batch = batch_features(store, [1, 2], max_rows=10)
    assert batch.shape == (2, 10, 16)
    np.testing.assert_allclose(batch[0, :5], store.get(1).features)
    assert np.all(batch[0, 5:] == 0)
