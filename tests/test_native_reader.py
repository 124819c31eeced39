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


def _packed_world(tmp_path, n_imgs=5, dim=16):
    import h5py
    from vsrcic_tpu.data import PackedFeatureStore
    rng = np.random.RandomState(3)
    h5 = tmp_path / "w.hdf5"
    with h5py.File(h5, "w") as f:
        for i in range(1, n_imgs + 1):
            n = rng.randint(3, 12)
            f["%d_cls_prob" % i] = rng.rand(n, 4).astype(np.float32)
            f["%d_features" % i] = rng.rand(n, dim).astype(np.float32)
            f["%d_boxes" % i] = rng.rand(n, 4).astype(np.float32)
    return PackedFeatureStore.convert_hdf5(str(h5), str(tmp_path / "pk"))


def test_image_field_preprocess_batch_matches_item_path(tmp_path):
    """The DataLoader's batched native-ingest path must produce the exact
    per-item field outputs (this is the production COCO/Flickr train/eval
    ingest when the store is packed)."""
    from vsrcic_tpu.data import (DataLoader, ImageDetectionsField,
                                 PairedDataset, RawField)
    from vsrcic_tpu.data.dataset import Example

    store = _packed_world(tmp_path)
    field = ImageDetectionsField(store, max_detections=8)
    paths = ["imgs/COCO_train2014_%012d.jpg" % i for i in range(1, 6)]
    batch_out = field.preprocess_batch(paths)
    for x, (feats, iid) in zip(paths, batch_out):
        f1, i1 = field.preprocess(x)
        np.testing.assert_array_equal(feats, f1)
        assert iid == i1

    examples = [Example.fromdict({"image": p, "text": "a b"}) for p in paths]
    ds = PairedDataset(examples, {"image": field, "text": RawField()})
    loader = DataLoader(ds, batch_size=3)
    batches = list(loader)
    assert len(batches) == 2
    (feats0, ids0), _ = batches[0]
    assert feats0.shape == (3, 8, 16)
    f_ref, _ = field.preprocess(paths[0])
    np.testing.assert_array_equal(feats0[0], f_ref)


def test_flickr_field_preprocess_batch_matches_item_path(tmp_path):
    from vsrcic_tpu.data import FlickrDetectionField
    store = _packed_world(tmp_path)
    field = FlickrDetectionField(store, diverse=True, max_detections=6)
    paths = ["imgs/%d.jpg" % i for i in range(1, 6)]
    for x, (feats, iid) in zip(paths, field.preprocess_batch(paths)):
        f1, i1 = field.preprocess(x)
        np.testing.assert_array_equal(feats, f1)
        assert iid == i1
    plain = FlickrDetectionField(store, diverse=False, max_detections=6)
    for x, feats in zip(paths, plain.preprocess_batch(paths)):
        np.testing.assert_array_equal(feats, plain.preprocess(x))


def test_preprocess_batch_missing_id_falls_back(tmp_path):
    from vsrcic_tpu.data import ImageDetectionsField
    store = _packed_world(tmp_path)
    field = ImageDetectionsField(store, max_detections=8)
    paths = ["imgs/COCO_train2014_%012d.jpg" % i for i in (1, 999)]
    out = field.preprocess_batch(paths)   # per-item fallback (warn + rand)
    assert out[0][1] == 1 and out[1][1] == 999
    # missing ids take the reference's rand(10, 2048) affordance (ref
    # field.py:76-78), padded/truncated to max_detections
    assert out[1][0].shape == (8, 2048)
    f_ref, _ = field.preprocess(paths[0])
    np.testing.assert_array_equal(out[0][0], f_ref)


def test_dictionary_dataset_batched_key_ingest(tmp_path):
    """DictionaryDataset.get_batch routes the key field (detections in the
    eval pipelines) through preprocess_batch; items equal __getitem__."""
    from vsrcic_tpu.data import (DataLoader, DictionaryDataset,
                                 ImageDetectionsField, RawField)
    from vsrcic_tpu.data.dataset import Example

    store = _packed_world(tmp_path)
    field = ImageDetectionsField(store, max_detections=8)
    examples = []
    for i in range(1, 6):
        p = "imgs/COCO_train2014_%012d.jpg" % i
        for c in range(2):   # two captions per image
            examples.append(Example.fromdict(
                {"image": p, "text": "cap %d %d" % (i, c)}))
    ds = DictionaryDataset(examples, {"image": field, "text": RawField()},
                           "image")
    items_batched = ds.get_batch(list(range(len(ds))))
    for i, (kv, vals) in enumerate(items_batched):
        kv_ref, vals_ref = ds[i]
        np.testing.assert_array_equal(kv[0], kv_ref[0])
        assert kv[1] == kv_ref[1]
        assert vals == vals_ref
    loader = DataLoader(ds, batch_size=3)
    batches = list(loader)
    assert sum(len(k[0]) for k, _ in batches) == len(ds)

def test_bf16_at_rest_store_roundtrip(tmp_path):
    """bf16-at-rest packed store: convert_hdf5 quantizes once; the batched
    gather returns bf16 (half the memcpy bytes), the per-item path widens
    to f32 EXACTLY (every bf16 value is f32-representable), and the
    field's batch path emits one consistent dtype on both the native and
    fallback routes."""
    import h5py
    import ml_dtypes
    from vsrcic_tpu.data import ImageDetectionsField, PackedFeatureStore
    from vsrcic_tpu.data.native_reader import batch_features

    rng = np.random.RandomState(7)
    h5 = tmp_path / "d.hdf5"
    with h5py.File(h5, "w") as f:
        for i, n in [(1, 5), (2, 8)]:
            f["%d_cls_prob" % i] = rng.rand(n, 4).astype(np.float32)
            f["%d_features" % i] = rng.rand(n, 16).astype(np.float32)
            f["%d_boxes" % i] = rng.rand(n, 4).astype(np.float32)
    store = PackedFeatureStore.convert_hdf5(
        str(h5), str(tmp_path / "pb"), dtype="bfloat16")
    assert store.dtype == np.dtype(ml_dtypes.bfloat16)

    # per-item get: f32, exactly the widened quantized values
    rec = store.get(1)
    assert rec.features.dtype == np.float32
    with h5py.File(h5, "r") as f:
        want = f["1_features"][()].astype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(rec.features,
                                  want.astype(np.float32))

    # batched gather: bf16 out, same values
    batch = batch_features(store, [1, 2], max_rows=10)
    assert batch.dtype == np.dtype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(batch[0, :5].astype(np.float32),
                                  rec.features)
    assert np.all(batch[0, 5:].astype(np.float32) == 0)

    # field: native batch path and the per-item fallback (missing id in
    # the batch) both emit bf16
    field = ImageDetectionsField(store, max_detections=8)
    paths = ["imgs/COCO_train2014_%012d.jpg" % i for i in (1, 2)]
    out = field.preprocess_batch(paths)
    assert all(f.dtype == np.dtype(ml_dtypes.bfloat16) for f, _ in out)
    out_fb = field.preprocess_batch(
        ["imgs/COCO_train2014_%012d.jpg" % i for i in (1, 999)])
    assert out_fb[0][0].dtype == np.dtype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(out_fb[0][0], out[0][0])
