"""Data layer: synthetic backend drives every field + dataset wrapper."""
import numpy as np
import pytest

from vsrcic_tpu.data import (
    COCOControlSequenceField, COCOControlSetField, COCOControlSetField_Verb,
    COCODetSetField_Verb, DataLoader, DictionaryDataset, ImageDetectionsField,
    PairedDataset, RawField, SyntheticCOCO)
from vsrcic_tpu.text import TextField


@pytest.fixture(scope="module")
def syn():
    return SyntheticCOCO(n_images=8, n_val=2, n_test=2, seed=0)


def test_entities_alignment(syn):
    train, val, test = syn.sample_splits
    assert len(train) == 8 and len(val) == 2 and len(test) == 2
    ex = train[0]
    # det_classes aligned per caption word: "a cls1 verbXs a cls2"
    det_classes = ex.detection[1]
    assert len(det_classes) == 5
    assert det_classes[0] == det_classes[1]  # chunk "a cls1"
    assert det_classes[2] is None            # verb word
    assert det_classes[3] == det_classes[4]


def test_captioner_training_pipeline(syn):
    image_field = ImageDetectionsField(syn.store, max_detections=100)
    det_field = COCOControlSequenceField(
        syn.store, classes_path=syn.classes, padding_idx=-1, all_boxes=False,
        fix_length=20)
    text_field = TextField(fix_length=20)
    train, _, _ = syn.sample_splits
    ds = PairedDataset(train, {"image": image_field, "detection": det_field,
                               "text": text_field})
    text_field.build_vocab([ex.text for ex in train], min_freq=1)
    ds.fields["text"] = RawField(
        preprocessing=None,
        postprocessing=None)
    loader = DataLoader(ds, batch_size=4)
    batch = next(iter(loader))
    (dets, img_ids), (det_seqs, gts, det_seqs_test, cls_test), caps = batch
    assert dets.shape == (4, 100, syn.feat_dim)
    assert det_seqs.shape == (4, 20, 20, syn.feat_dim)
    assert gts.shape == (4, 20)
    # shift-gate GT: 1 exactly where consecutive word classes differ
    assert set(np.unique(gts)) <= {-1.0, 0.0, 1.0}
    ids = text_field.process(caps)
    assert ids.shape == (4, 20)


def test_control_set_field(syn):
    det_field = COCOControlSetField(
        syn.store, classes_path=syn.classes, img_shapes_path=syn.img_shapes,
        precomp_glove_path=syn.vectors, verb_idx_path=syn.verb_2_idx,
        idx_vs_path=syn.idx_2_vs, cap_classes_path=syn.cap_2_classes,
        cap_verb_path=syn.cap_2_verb, fix_length=10, max_detections=20)
    train, _, _ = syn.sample_splits
    out = det_field.preprocess((
        (train[0].image, train[0].detection[0][1]), train[0].detection[1]))
    word, vis, pos, vis_all, seq_v, seq_sr, control_verb, gt_v, gt_sr, idx = out
    assert word.shape == (10, 300) and vis_all.shape == (10, 20, syn.feat_dim)
    assert control_verb[0] >= 1  # verb present
    assert gt_sr.max() > 0
    # idx_list holds the alphabetical-sort permutation
    valid = idx[idx >= 0]
    assert sorted(valid.tolist()) == list(range(len(valid)))


def test_control_set_field_verb_and_dict_dataset(syn):
    det_field = COCOControlSetField_Verb(
        syn.store, classes_path=syn.classes, img_shapes_path=syn.img_shapes,
        precomp_glove_path=syn.vectors, verb_idx_path=syn.verb_2_idx,
        idx_vs_path=syn.idx_2_vs_v, cap_classes_path=syn.cap_2_classes_v,
        cap_verb_path=syn.cap_2_verb_v, vocab_path=list(syn.class_names),
        idx_2_verb_og_path=syn.idx_2_v_og, verb_vob_path={},
        fix_length=10, max_detections=20)
    image_field = ImageDetectionsField(syn.store, max_detections=100)
    _, _, test = syn.sample_splits
    ds = DictionaryDataset(
        test, {"image": image_field, "detection": det_field,
               "text": RawField()}, "image")
    loader = DataLoader(ds, batch_size=2)
    keys, values = next(iter(loader))
    dets, img_ids = keys
    assert dets.shape[0] == 2
    per_image = values["detection"]
    assert len(per_image) == 2
    out0 = per_image[0][0]
    assert len(out0) == 11  # _Verb field returns 11 tensors
    word, vis, pos, vis_all, seq_v, seq_sr, cv, gt_v, gt_sr, idx, vl = out0
    # exactly one verb slot: pooled feature + verb_list entry
    assert (vl >= 0).sum() == 1


def test_det_set_field_verb(syn):
    det_field = COCODetSetField_Verb(
        syn.store, cls_seq_path=syn.img_cap_v_2_class_self,
        vocab_path=list(syn.class_names),
        vlem_2_v_og_path=syn.vlem_2_vog, verb_idx_path=syn.verb_2_idx,
        classes_path=syn.classes, img_shapes_path=syn.img_shapes,
        precomp_glove_path=syn.vectors, fix_length=10, max_detections=20)
    _, _, test = syn.sample_splits
    ex = test[0]
    out = det_field.preprocess(((ex.image, ex.detection[0][1]),
                                ex.detection[1]))
    assert len(out) == 9
    word, vis, pos, vis_all, seq_v, seq_sr, cv, idx, vl = out
    assert (vl >= 0).sum() == 1  # one 'verb' slot prepended
    assert seq_sr.max() == 25    # V role present


def test_packed_store_roundtrip(tmp_path, syn):
    import h5py
    from vsrcic_tpu.data import PackedFeatureStore, HDF5FeatureStore
    h5 = tmp_path / "dets.hdf5"
    rec = syn.store.get(100000)
    with h5py.File(h5, "w") as f:
        f["100000_cls_prob"] = rec.cls_probs
        f["100000_features"] = rec.features
        f["100000_boxes"] = rec.boxes
    packed = PackedFeatureStore.convert_hdf5(str(h5), str(tmp_path / "packed"))
    got = packed.get(100000)
    np.testing.assert_allclose(got.features, rec.features, rtol=1e-6)
    np.testing.assert_allclose(got.boxes, rec.boxes, rtol=1e-6)
    hstore = HDF5FeatureStore(str(h5))
    np.testing.assert_allclose(hstore.get(100000).features, rec.features)


def test_dataloader_num_workers_same_batches(syn):
    """Thread-pool preprocessing yields identical batches."""
    image_field = ImageDetectionsField(syn.store, max_detections=20)
    train, _, _ = syn.sample_splits
    ds = PairedDataset(train, {"image": image_field, "text": RawField()})
    b0 = list(DataLoader(ds, batch_size=3))
    b4 = list(DataLoader(ds, batch_size=3, num_workers=4))
    assert len(b0) == len(b4)
    for (a_img, a_txt), (b_img, b_txt) in zip(b0, b4):
        np.testing.assert_array_equal(a_img[0], b_img[0])
        assert list(a_txt) == list(b_txt)


def test_synthetic_worlds_have_ambiguous_sr_pairs():
    """The synthetic backends must include repeated-SR captions ("a X and
    a Y verbs a Z") so Sinkhorn training and eval re-ranking actually
    execute — without them every batch's pair extraction returned None
    and Sinkhorn training was a silent no-op (caught in round 4)."""
    from vsrcic_tpu.data.synthetic_flickr import SyntheticFlickr
    from vsrcic_tpu.pipelines.sr_groups import extract_verb_groups

    syn = SyntheticCOCO(n_images=9, n_val=2, n_test=2, seed=0)
    n_rerank = 0
    for key, caps in syn.idx_2_vs.items():
        for cap, vs in caps.items():
            srs = [s[0] for s in vs["sr"]]
            if len(srs) != len(set(srs)):
                n_rerank += 1
    assert n_rerank >= 3   # every 3rd image

    # multi-verb captions exist too (every 5th non-colliding image) — the
    # eval pipeline's verb_rank_merge branch needs them to ever fire
    n_multi = sum(1 for caps in syn.cap_2_verb.values()
                  for vs in caps.values() if len(vs) >= 2)
    assert n_multi >= 1

    synf = SyntheticFlickr(n_images=9, n_val=2, n_test=2, seed=0)
    n_rerank_f = sum(
        1 for caps in synf.idx_2_vs.values() for vs in caps.values()
        if len([s[0] for s in vs["sr"]]) != len({s[0] for s in vs["sr"]}))
    assert n_rerank_f >= 3
