"""Golden parity: our field ports vs the actual reference data/field.py
(imported via a speaksee stub), on synthetic HDF5 + side tables."""
import json
import os
import pickle
import random
import sys

import numpy as np
import pytest

import speaksee_stub
speaksee_stub.install()

import importlib.util
_spec = importlib.util.spec_from_file_location(
    "ref_field", "/root/reference/data/field.py")
ref_field = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ref_field)

from vsrcic_tpu.data import (COCOControlSequenceField, HDF5FeatureStore,
                             ImageDetectionsField, COCOControlSetField)

N_CLASSES = 8
CLASSES = ["cls%d" % i for i in range(N_CLASSES)]


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    import h5py
    root = tmp_path_factory.mktemp("fieldworld")
    rng = np.random.RandomState(0)
    h5 = str(root / "dets.hdf5")
    img_id = 42
    n, d = 12, 32
    probs = rng.rand(n, N_CLASSES + 1).astype(np.float32)
    feats = rng.rand(n, d).astype(np.float32)
    x1 = rng.rand(n, 1) * 100
    y1 = rng.rand(n, 1) * 100
    boxes = np.concatenate([x1, y1, x1 + 50, y1 + 50], 1).astype(np.float32)
    with h5py.File(h5, "w") as f:
        f["%d_cls_prob" % img_id] = probs
        f["%d_features" % img_id] = feats
        f["%d_boxes" % img_id] = boxes

    classes_txt = str(root / "object_class_list.txt")
    with open(classes_txt, "w") as f:
        for c in CLASSES:
            f.write(c + "\n")

    selected = [CLASSES[int(np.argmax(probs[i][1:]))] for i in range(n)]
    image = "x/COCO_x_%012d.jpg" % img_id
    c_a, c_b = selected[0], selected[1]
    caption = "a %s verb0s a %s" % (c_a, c_b)
    det_classes = (c_a, c_a, None, c_b, c_b)

    glove = str(root / "glove.pkl")
    with open(glove, "wb") as f:
        pickle.dump({c: rng.randn(300).astype(np.float32) for c in CLASSES},
                    f)

    tables = {
        "img_shapes": {str(img_id): [640, 480]},
        "verb_2_idx": {"verb0": 0, "verb1": 1},
        "idx_2_vs": {str(img_id): {caption: {
            "verb": [["verb0"], ["verb0"]],
            "sr": [["ARG0"], ["ARG1"]]}}},
        "cap_2_classes": {str(img_id): {caption: [c_a, c_b]}},
        "cap_2_verb": {str(img_id): {caption: ["verb0"]}},
    }
    paths = {}
    for name, obj in tables.items():
        p = str(root / (name + ".json"))
        with open(p, "w") as f:
            json.dump(obj, f)
        paths[name] = p
    return dict(h5=h5, classes_txt=classes_txt, glove=glove, image=image,
                caption=caption, det_classes=det_classes, paths=paths,
                img_id=img_id)


def test_control_sequence_field_parity(world):
    RefField = ref_field.COCOControlSequenceField
    ref = RefField(detections_path=world["h5"],
                   classes_path=world["classes_txt"], padding_idx=-1,
                   all_boxes=False, fix_length=20, pad_init=False)
    mine = COCOControlSequenceField(
        HDF5FeatureStore(world["h5"]), classes_path=world["classes_txt"],
        padding_idx=-1, all_boxes=False, fix_length=20)
    x = ((world["image"], world["caption"]), world["det_classes"])
    r = ref.preprocess(x)
    m = mine.preprocess(x)
    for a, b in zip(r, m):
        if isinstance(a, str):
            assert a == b
        else:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6)


def test_image_detections_field_parity(world):
    RefField = ref_field.ImageDetectionsField
    ref = RefField(detections_path=world["h5"], load_in_tmp=False,
                   max_detections=20)
    mine = ImageDetectionsField(HDF5FeatureStore(world["h5"]),
                                max_detections=20)
    r_feat, r_id = ref.preprocess(world["image"])
    m_feat, m_id = mine.preprocess(world["image"])
    assert r_id == m_id
    np.testing.assert_allclose(r_feat, m_feat, rtol=1e-6)


def test_control_set_field_parity(world):
    RefField = ref_field.COCOControlSetField
    p = world["paths"]
    kw_ref = dict(detections_path=world["h5"],
                  classes_path=world["classes_txt"],
                  img_shapes_path=p["img_shapes"],
                  precomp_glove_path=world["glove"],
                  verb_idx_path=p["verb_2_idx"], idx_vs_path=p["idx_2_vs"],
                  cap_classes_path=p["cap_2_classes"],
                  cap_verb_path=p["cap_2_verb"],
                  fix_length=10, max_detections=20)
    ref = RefField(**kw_ref)
    mine = COCOControlSetField(
        HDF5FeatureStore(world["h5"]), classes_path=world["classes_txt"],
        img_shapes_path=p["img_shapes"], precomp_glove_path=world["glove"],
        verb_idx_path=p["verb_2_idx"], idx_vs_path=p["idx_2_vs"],
        cap_classes_path=p["cap_2_classes"], cap_verb_path=p["cap_2_verb"],
        fix_length=10, max_detections=20)
    x = ((world["image"], world["caption"]), None)
    r = ref.preprocess(x)
    m = mine.preprocess(x)
    assert len(r) == len(m) == 10
    for i, (a, b) in enumerate(zip(r, m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   err_msg="output %d differs" % i)
