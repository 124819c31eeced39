"""Golden parity for the remaining fields (D8-D15) vs the actual reference
data/field.py, on synthetic HDF5 + side tables.

The shuffle-GT fields (COCOControlSetField_Verb, COCODetSetField_Verb,
FlickrControlSetField(_Verb)) consume the global `random` module exactly once
(one shuffle of the same-length list), so seeding `random` identically before
each preprocess call makes reference and port outputs comparable bit-for-bit.
"""
import json
import pickle
import random

import numpy as np
import pytest

import speaksee_stub
speaksee_stub.install()

import importlib.util
_spec = importlib.util.spec_from_file_location(
    "ref_field", "/root/reference/data/field.py")
ref_field = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ref_field)

from vsrcic_tpu.data import HDF5FeatureStore
from vsrcic_tpu.data.fields import (COCOControlSetField_Verb, COCODetSetField,
                                    COCODetSetField_Verb)
from vsrcic_tpu.data.fields_flickr import (FlickrControlSetField,
                                           FlickrControlSetField_Verb,
                                           FlickrDetectionField,
                                           FlickrDetSetField,
                                           FlickrDetSetField_Verb)

N_CLASSES = 7  # cls6 is never the argmax of any detection (fallback trigger)
CLASSES = ["cls%d" % i for i in range(N_CLASSES)]


def _dump_json(root, name, obj):
    p = str(root / (name + ".json"))
    with open(p, "w") as f:
        json.dump(obj, f)
    return p


def assert_tuples_equal(r, m, n_expected=None):
    if n_expected is not None:
        assert len(r) == n_expected
    assert len(r) == len(m)
    for i, (a, b) in enumerate(zip(r, m)):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64),
            rtol=1e-6, err_msg="output %d differs" % i)


@pytest.fixture(scope="module")
def coco_world(tmp_path_factory):
    import h5py
    root = tmp_path_factory.mktemp("cocofieldworld2")
    rng = np.random.RandomState(7)
    img_id = 77
    n, d = 10, 16
    # detection i is classified as cls(i % 6); cls6 never selected
    probs = rng.rand(n, N_CLASSES + 1).astype(np.float32) * 0.1
    for i in range(n):
        probs[i, (i % 6) + 1] = 1.0
    feats = rng.rand(n, d).astype(np.float32)
    x1 = rng.rand(n, 1) * 100
    y1 = rng.rand(n, 1) * 100
    boxes = np.concatenate([x1, y1, x1 + 60, y1 + 40], 1).astype(np.float32)
    h5 = str(root / "dets.hdf5")
    with h5py.File(h5, "w") as f:
        f["%d_cls_prob" % img_id] = probs
        f["%d_features" % img_id] = feats
        f["%d_boxes" % img_id] = boxes

    classes_txt = str(root / "object_class_list.txt")
    with open(classes_txt, "w") as f:
        for c in CLASSES:
            f.write(c + "\n")

    glove = str(root / "glove.pkl")
    with open(glove, "wb") as f:
        pickle.dump({c: rng.randn(300).astype(np.float32) for c in CLASSES},
                    f)

    image = "x/COCO_x_%012d.jpg" % img_id
    caption = "the cls1 holds a cls2 while running to cls3"
    # caption2: REPEATED SR — two slots (and two class ids) share hold/ARG0,
    # the need_re_rank case that drives the Sinkhorn re-ranking path
    caption2 = "a cls1 and a cls2 holds a cls3"
    sid = str(img_id)

    paths = {
        "img_shapes": _dump_json(root, "img_shapes", {sid: [640, 480]}),
        "verb_2_idx": _dump_json(root, "verb_2_idx", {"hold": 0, "run": 1}),
        "vocab": _dump_json(root, "vocab",
                            ["<unk>", "a", "holds", "running", "cls1"]),
        "verb_vob": _dump_json(root, "verb_vob", {}),
        # D8/D10: verb -> SR -> 1-based class ids (ref field.py:319,604)
        "v_2_class": _dump_json(root, "v_2_class", {sid: {
            caption: {"hold": {"ARG0": [2], "ARG1": [3]},
                      "run": {"LOC": [4], "DIR": [2]}},
            caption2: {"hold": {"ARG0": [2, 3], "ARG1": [4]}}}}),
        # same but including a class (cls6, id 7) with no matching detection
        "v_2_class_miss": _dump_json(root, "v_2_class_miss", {sid: {
            caption: {"hold": {"ARG0": [2], "ARG1": [7]},
                      "run": {"LOC": [4]}},
            caption2: {"hold": {"ARG0": [2, 3], "ARG1": [4]}}}}),
        # D9 tables (per caption-slot verb/SR grids, ref :450-453)
        "idx_2_vs": _dump_json(root, "idx_2_vs", {sid: {
            caption: {
                "verb": [["hold"], ["hold"], ["hold", "run"], ["run"],
                         ["run"]],
                "sr": [["ARG0"], ["V"], ["ARG1", "LOC"], ["V"], ["DIR"]]},
            caption2: {
                "verb": [["hold"], ["hold"], ["hold"], ["hold"]],
                "sr": [["ARG0"], ["ARG0"], ["V"], ["ARG1"]]}}}),
        "cap_2_classes": _dump_json(root, "cap_2_classes", {sid: {
            caption: ["cls1", "verb", "cls2", "verb", "cls3"],
            caption2: ["cls1", "cls2", "verb", "cls3"]}}),
        "cap_2_verb": _dump_json(root, "cap_2_verb", {sid: {
            caption: ["hold", "run"], caption2: ["hold"]}}),
        "idx_2_v_og": _dump_json(root, "idx_2_v_og", {sid: {
            caption: [["holds"], ["holds"], ["holds", "running"],
                      ["notinvocab"], ["running"]],
            caption2: [["holds"], ["holds"], ["holds"], ["holds"]]}}),
        "vlem_2_v_og": _dump_json(root, "vlem_2_v_og", {sid: {
            caption: [["hold", "holds"], ["run", "running"]],
            caption2: [["hold", "holds"]]}}),
    }
    return dict(h5=h5, classes_txt=classes_txt, glove=glove, image=image,
                caption=caption, caption2=caption2, paths=paths)


def _coco_common(world):
    p = world["paths"]
    return dict(detections_path=world["h5"],
                classes_path=world["classes_txt"],
                img_shapes_path=p["img_shapes"],
                precomp_glove_path=world["glove"],
                verb_idx_path=p["verb_2_idx"],
                fix_length=10, max_detections=5)


def _mine_common(world):
    p = world["paths"]
    return dict(classes_path=world["classes_txt"],
                img_shapes_path=p["img_shapes"],
                precomp_glove_path=world["glove"],
                verb_idx_path=p["verb_2_idx"],
                fix_length=10, max_detections=5)


def test_det_set_field_parity(coco_world):
    """D8 vs reference field.py:273-381 (alphabetical-sort permutation GT)."""
    p = coco_world["paths"]
    ref = ref_field.COCODetSetField(cls_seq_path=p["v_2_class"],
                                    **_coco_common(coco_world))
    mine = COCODetSetField(HDF5FeatureStore(coco_world["h5"]),
                           cls_seq_path=p["v_2_class"],
                           **_mine_common(coco_world))
    x = ((coco_world["image"], coco_world["caption"]), None)
    assert_tuples_equal(ref.preprocess(x), mine.preprocess(x), n_expected=8)


@pytest.mark.parametrize("gt_verb", [False, True])
def test_control_set_field_verb_parity(coco_world, gt_verb):
    """D9 vs reference field.py:384-541 (random-shuffle permutation GT,
    verb slots with pooled features, verb_list vs verb_list_og)."""
    p = coco_world["paths"]
    kw = dict(idx_vs_path=p["idx_2_vs"], cap_classes_path=p["cap_2_classes"],
              cap_verb_path=p["cap_2_verb"], vocab_path=p["vocab"],
              idx_2_verb_og_path=p["idx_2_v_og"],
              verb_vob_path=p["verb_vob"], gt_verb=gt_verb)
    ref = ref_field.COCOControlSetField_Verb(**kw, **_coco_common(coco_world))
    mine = COCOControlSetField_Verb(HDF5FeatureStore(coco_world["h5"]), **kw,
                                    **_mine_common(coco_world))
    x = ((coco_world["image"], coco_world["caption"]), None)
    for seed in (0, 1, 1234):
        random.seed(seed)
        r = ref.preprocess(x)
        random.seed(seed)
        m = mine.preprocess(x)
        assert_tuples_equal(r, m, n_expected=11)


@pytest.mark.parametrize("gt_verb", [False, True])
def test_det_set_field_verb_parity(coco_world, gt_verb):
    """D10 vs reference field.py:544-714 ('verb' tokens prepended; missing
    detected class falls back to det_ids=[1], ref :680-682)."""
    p = coco_world["paths"]
    kw = dict(cls_seq_path=p["v_2_class_miss"], vocab_path=p["vocab"],
              vlem_2_v_og_path=p["vlem_2_v_og"], gt_verb=gt_verb)
    ref = ref_field.COCODetSetField_Verb(**kw, **_coco_common(coco_world))
    mine = COCODetSetField_Verb(HDF5FeatureStore(coco_world["h5"]), **kw,
                                **_mine_common(coco_world))
    x = ((coco_world["image"], coco_world["caption"]), None)
    for seed in (0, 3):
        random.seed(seed)
        r = ref.preprocess(x)
        random.seed(seed)
        m = mine.preprocess(x)
        assert_tuples_equal(r, m, n_expected=9)


# ---------------------------------------------------------------------------
# Flickr
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def flickr_world(tmp_path_factory):
    import h5py
    root = tmp_path_factory.mktemp("flickrfieldworld")
    rng = np.random.RandomState(11)
    img_id = "345"
    n, d = 8, 16
    probs = rng.rand(n, N_CLASSES + 1).astype(np.float32) * 0.1
    for i in range(n):
        probs[i, (i % 6) + 1] = 1.0
    feats = rng.rand(n, d).astype(np.float32)
    x1 = rng.rand(n, 1) * 200
    y1 = rng.rand(n, 1) * 150
    det_boxes = np.concatenate([x1, y1, x1 + 80, y1 + 60], 1
                               ).astype(np.float32)
    h5 = str(root / "flickr_dets.hdf5")
    with h5py.File(h5, "w") as f:
        f["%s_cls_prob" % img_id] = probs
        f["%s_features" % img_id] = feats
        f["%s_boxes" % img_id] = det_boxes

    classes_txt = str(root / "object_class_list.txt")
    with open(classes_txt, "w") as f:
        for c in CLASSES:
            f.write(c + "\n")
    glove = str(root / "glove.pkl")
    with open(glove, "wb") as f:
        pickle.dump({c: rng.randn(300).astype(np.float32) for c in CLASSES},
                    f)

    # GT entity boxes: entity k has 1-3 boxes, overlapping some detections
    gt_bboxes = []
    for k in range(4):
        n_b = [2, 1, 3, 1][k]
        ent = []
        for b in range(n_b):
            src = det_boxes[(k + b) % n]
            ent.append([float(src[0]) + 5, float(src[1]) + 5,
                        float(src[2]) - 5, float(src[3]) - 5])
        gt_bboxes.append(ent)

    image = "d/%s.jpg" % img_id
    caption = "a cls1 holding a cls2 while a cls3 runs"
    # per caption-slot: slot 2 is the verb slot (class -1 -> -2 after shift);
    # slot 3 carries a verb NOT in cap_2_verb (filtered out, ref :854,896)
    paths = {
        "img_shapes": _dump_json(root, "img_shapes", {img_id: [500, 400]}),
        "verb_idx": _dump_json(root, "verb_idx",
                               {"hold": 0, "run": 1, "jump": 2}),
        "idx_2_vs": _dump_json(root, "idx_2_vs", {img_id: {caption: {
            "verb": [["hold_0"], ["hold_0"], ["run_1"],
                     ["jump_0", "hold_0"]],
            "sr": [[1], [2], [25], [7, 2]]}}}),
        "cap_2_verb": _dump_json(root, "cap_2_verb",
                                 {img_id: {caption: ["hold_0", "run_1"]}}),
        "cap_2_classes": _dump_json(root, "cap_2_classes",
                                    {img_id: {caption: [1, 2, -1, 3]}}),
        "idx_v_og": _dump_json(root, "idx_v_og", {img_id: {caption: [
            ["holds"], ["holds"], ["running"], ["jumps"]]}}),
        "vocab": _dump_json(root, "vocab",
                            ["<unk>", "a", "holds", "running"]),
        "verb_vob": _dump_json(root, "verb_vob", {}),
        # D13/D15: verb -> SR(numeric string) -> detection-row ids
        "idbox": _dump_json(root, "idbox", {img_id: {caption: {
            "hold_0": {"1": [0, 2], "2": [1]},
            "run_1": {"7": [3], "2": [1]}}}}),
        "vlem_2_verb_og": _dump_json(root, "vlem_2_verb_og",
                                     {img_id: {caption: [
                                         ["hold", "holds"],
                                         ["run", "running"]]}}),
    }
    return dict(h5=h5, classes_txt=classes_txt, glove=glove, image=image,
                caption=caption, gt_bboxes=gt_bboxes, paths=paths)


def test_flickr_detection_field_parity(flickr_world):
    """D11 vs reference field.py:718-742."""
    ref = ref_field.FlickrDetectionField(
        detections_path=flickr_world["h5"], diverse=True)
    mine = FlickrDetectionField(HDF5FeatureStore(flickr_world["h5"]),
                                diverse=True)
    r_feat, r_id = ref.preprocess(flickr_world["image"])
    m_feat, m_id = mine.preprocess(flickr_world["image"])
    assert r_id == m_id
    np.testing.assert_allclose(r_feat, m_feat, rtol=1e-6)


def _flickr_common(world):
    p = world["paths"]
    return dict(classes_path=world["classes_txt"],
                img_shapes_path=p["img_shapes"],
                precomp_glove_path=world["glove"],
                verb_idx_path=p["verb_idx"],
                fix_length=10, max_detections=5)


@pytest.mark.parametrize("visual", [True, False])
def test_flickr_control_set_field_parity(flickr_world, visual):
    """D12 vs reference field.py:746-908 (IoU entity->detection matching,
    10000-offset verb codes)."""
    p = flickr_world["paths"]
    kw = dict(idx_vs_path=p["idx_2_vs"], cap_verb_path=p["cap_2_verb"],
              cap_classes_path=p["cap_2_classes"], visual=visual)
    ref = ref_field.FlickrControlSetField(detections_path=flickr_world["h5"],
                                          **kw, **_flickr_common(flickr_world))
    mine = FlickrControlSetField(HDF5FeatureStore(flickr_world["h5"]), **kw,
                                 **_flickr_common(flickr_world))
    x = ((flickr_world["image"], flickr_world["caption"]),
         flickr_world["gt_bboxes"])
    for seed in (0, 5):
        random.seed(seed)
        r = ref.preprocess(x)
        random.seed(seed)
        m = mine.preprocess(x)
        assert_tuples_equal(r, m, n_expected=10 if visual else 6)


@pytest.mark.parametrize("visual,gt_verb",
                         [(True, False), (True, True), (False, False),
                          (False, True)])
def test_flickr_control_set_field_verb_parity(flickr_world, visual, gt_verb):
    """D14 vs reference field.py:1032-1231 (single best-IoU box per entity,
    pooled verb slot, verb_list vs verb_list_og)."""
    p = flickr_world["paths"]
    kw = dict(idx_vs_path=p["idx_2_vs"], cap_verb_path=p["cap_2_verb"],
              cap_classes_path=p["cap_2_classes"],
              idx_v_og_path=p["idx_v_og"], vocab_list_path=p["vocab"],
              visual=visual, gt_verb=gt_verb)
    ref = ref_field.FlickrControlSetField_Verb(
        detections_path=flickr_world["h5"], **kw,
        **_flickr_common(flickr_world))
    mine = FlickrControlSetField_Verb(HDF5FeatureStore(flickr_world["h5"]),
                                      **kw, **_flickr_common(flickr_world))
    x = ((flickr_world["image"], flickr_world["caption"]),
         flickr_world["gt_bboxes"])
    for seed in (0, 9):
        random.seed(seed)
        r = ref.preprocess(x)
        random.seed(seed)
        m = mine.preprocess(x)
        assert_tuples_equal(r, m, n_expected=11 if visual else 7)


def test_flickr_det_set_field_parity(flickr_world):
    """D13 vs reference field.py:911-1029 (box-id sequence keyed fields)."""
    p = flickr_world["paths"]
    kw = dict(verb_vob_path=p["verb_vob"], idbox_seq_path=p["idbox"])
    ref = ref_field.FlickrDetSetField(detections_path=flickr_world["h5"],
                                      **kw, **_flickr_common(flickr_world))
    mine = FlickrDetSetField(HDF5FeatureStore(flickr_world["h5"]), **kw,
                             **_flickr_common(flickr_world))
    x = ((flickr_world["image"], flickr_world["caption"]),
         flickr_world["gt_bboxes"], None)
    assert_tuples_equal(ref.preprocess(x), mine.preprocess(x), n_expected=7)


@pytest.mark.parametrize("gt_verb", [False, True])
def test_flickr_det_set_field_verb_parity(flickr_world, gt_verb):
    """D15 vs reference field.py:1234-1388 (verb slots appended at the end;
    sr=25 for the appended slots)."""
    p = flickr_world["paths"]
    kw = dict(verb_vob_path=p["verb_vob"], idbox_seq_path=p["idbox"],
              vocab_list_path=p["vocab"],
              vlem_2_verb_og_path=p["vlem_2_verb_og"], gt_verb=gt_verb)
    ref = ref_field.FlickrDetSetField_Verb(detections_path=flickr_world["h5"],
                                           **kw,
                                           **_flickr_common(flickr_world))
    mine = FlickrDetSetField_Verb(HDF5FeatureStore(flickr_world["h5"]), **kw,
                                  **_flickr_common(flickr_world))
    x = ((flickr_world["image"], flickr_world["caption"]),
         flickr_world["gt_bboxes"])
    assert_tuples_equal(ref.preprocess(x), mine.preprocess(x), n_expected=8)


def test_repeated_sr_caption_parity(coco_world):
    """Repeated-SR caption (two slots + two class ids under hold/ARG0) vs
    the reference fields — the grids that make a (verb, SR) pair ambiguous
    and trigger Sinkhorn re-ranking downstream were otherwise only
    exercised by single-SR fixtures."""
    p = coco_world["paths"]
    x = ((coco_world["image"], coco_world["caption2"]), None)

    ref = ref_field.COCODetSetField(cls_seq_path=p["v_2_class"],
                                    **_coco_common(coco_world))
    mine = COCODetSetField(HDF5FeatureStore(coco_world["h5"]),
                           cls_seq_path=p["v_2_class"],
                           **_mine_common(coco_world))
    assert_tuples_equal(ref.preprocess(x), mine.preprocess(x), n_expected=8)

    kw = dict(idx_vs_path=p["idx_2_vs"], cap_classes_path=p["cap_2_classes"],
              cap_verb_path=p["cap_2_verb"], vocab_path=p["vocab"],
              idx_2_verb_og_path=p["idx_2_v_og"],
              verb_vob_path=p["verb_vob"], gt_verb=False)
    ref9 = ref_field.COCOControlSetField_Verb(**kw,
                                             **_coco_common(coco_world))
    mine9 = COCOControlSetField_Verb(HDF5FeatureStore(coco_world["h5"]),
                                     **kw, **_mine_common(coco_world))
    for seed in (0, 1234):
        random.seed(seed)
        r = ref9.preprocess(x)
        random.seed(seed)
        m = mine9.preprocess(x)
        assert_tuples_equal(r, m, n_expected=11)
    # the repeated SR must actually be present in the emitted grids
    det_seqs_sr = np.asarray(r[5])
    vals, counts = np.unique(det_seqs_sr[det_seqs_sr != 0],
                             return_counts=True)
    assert (counts >= 2).any(), "fixture no longer repeats an SR"

    kw10 = dict(cls_seq_path=p["v_2_class_miss"], vocab_path=p["vocab"],
                vlem_2_v_og_path=p["vlem_2_v_og"], gt_verb=False)
    ref10 = ref_field.COCODetSetField_Verb(**kw10,
                                          **_coco_common(coco_world))
    mine10 = COCODetSetField_Verb(HDF5FeatureStore(coco_world["h5"]),
                                  **kw10, **_mine_common(coco_world))
    for seed in (0, 3):
        random.seed(seed)
        r = ref10.preprocess(x)
        random.seed(seed)
        m = mine10.preprocess(x)
        assert_tuples_equal(r, m, n_expected=9)
