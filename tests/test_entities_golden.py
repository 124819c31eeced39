"""Golden parity: COCOEntities / FlickrEntities sample construction vs the
actual reference /root/reference/data/dataset.py (imported via the speaksee
stub and executed on the same fixtures).

This closes the last parity-defining layer that was only tested against
synthetic expectations: chunk alignment (ref :123-141), verb/det filters
(ref :88-110, :269-292), the groupby drop rule, the '_'-in-detection val/test
filter, Flickr XML/Sentences parsing and its verb/det filters.
"""
import json
import os
import sys

import pytest

import speaksee_stub

speaksee_stub.install()

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref_dataset_mod():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import data.dataset as ref_ds
    return ref_ds


class Sample:
    def __init__(self, image, text):
        self.image = image
        self.text = text


def _coco_fixture():
    """Samples + entities/filter tables exercising every branch: chunk
    punctuation cleanup, multi-chunk captions, repeated classes, the
    groupby(det_classes) drop rule, missing chunks ('_' cells), filters."""
    def img(n):
        return "imgs/train2014/COCO_train2014_%012d.jpg" % n

    train = [
        Sample(img(1), "A man , riding -- a red bike .\n"),
        Sample(img(2), "the dog\tchases the cat ."),
        Sample(img(3), "two dogs and a dog run ."),        # repeated class
        Sample(img(4), "a plain caption with no chunks"),  # not in entities
        Sample(img(5), "a horse ; jumps"),
    ]
    val = [
        Sample(img(6), "a man holds a '' phone ."),
        Sample(img(7), "a bird flies high ."),
    ]
    test = [
        Sample(img(8), "a child eats cake ."),
        Sample(img(9), "a train at the station ."),
    ]
    entities = {
        "1": {"a man , riding -- a red bike .":
              [["a man ,", "person"], ["a red bike .", "bicycle"]]},
        "2": {"the dog\tchases the cat .": [],      # keyed on raw lowered?
              "the dog chases the cat .":
              [["the dog", "dog"], ["the cat .", "cat"]]},
        "3": {"two dogs and a dog run .":
              [["two dogs", "dog"], ["a dog", "dog"]]},
        "5": {"a horse ; jumps": [["a horse ;", "horse"]]},
        "6": {"a man holds a '' phone .":
              [["a man", "person"], ["a '' phone .", "phone"]]},
        "7": {"a bird flies high .":
              [["a bird", "bird"], ["a missing chunk", "plane"]]},  # drops
        "8": {"a child eats cake .":
              [["a child", "person"], ["cake .", "cake"]]},
        "9": {"a train at the station .":
              [["a train", "train"], ["the station .", "station"]]},
    }
    img_caps_vb = {str(n): [] for n in range(1, 10)}
    # verb filter keeps these captions only
    img_caps_vb["1"] = ["a man , riding -- a red bike ."]
    img_caps_vb["2"] = ["the dog chases the cat ."]
    img_caps_vb["3"] = ["two dogs and a dog run ."]
    img_caps_vb["4"] = ["a plain caption with no chunks"]
    img_caps_vb["5"] = []                              # dropped by filter
    img_caps_vb["6"] = ["a man holds a '' phone ."]
    img_caps_vb["7"] = ["a bird flies high ."]
    img_caps_vb["8"] = ["a child eats cake ."]
    img_caps_vb["9"] = []                              # test drop via filter
    det_map = {"8": ["a child eats cake ."]}           # 9 dropped in --det
    return (train, val, test), entities, img_caps_vb, det_map


def _write_coco_tables(tmp_path, entities, img_caps_vb, det_map):
    ddir = tmp_path / "saved_data" / "coco"
    ddir.mkdir(parents=True, exist_ok=True)
    ent_path = str(tmp_path / "coco_entities.json")
    with open(ent_path, "w") as f:
        json.dump(entities, f)
    with open(ddir / "img_caps_vb.json", "w") as f:
        json.dump(img_caps_vb, f)
    with open(ddir / "img_cap_v_2_class_self.json", "w") as f:
        json.dump(det_map, f)
    return ent_path, str(ddir)


def _cmp_examples(ref_split, our_split):
    assert len(ref_split) == len(our_split)
    for r, o in zip(ref_split, our_split):
        assert r.image == o.image
        assert r.text == o.text
        assert tuple(r.detection[0]) == tuple(o.detection[0])
        assert tuple(r.detection[1]) == tuple(o.detection[1])


@pytest.mark.parametrize("filtering,det_filtering", [
    (False, False), (True, False), (True, True)])
def test_coco_entities_golden(tmp_path, ref_dataset_mod, filtering,
                              det_filtering):
    from vsrcic_tpu.data import COCOEntities

    samples, entities, img_caps_vb, det_map = _coco_fixture()
    ent_path, ddir = _write_coco_tables(tmp_path, entities, img_caps_vb,
                                        det_map)
    old = os.getcwd()
    os.chdir(str(tmp_path))  # reference reads filter tables relative to CWD
    try:
        ref_out = ref_dataset_mod.COCOEntities.get_samples(
            samples, ent_path, filtering=filtering,
            det_filtering=det_filtering)
    finally:
        os.chdir(old)
    our_out = COCOEntities.get_samples(
        samples, ent_path, filtering=filtering, det_filtering=det_filtering,
        verb_filter_file=os.path.join(ddir, "img_caps_vb.json"),
        det_filter_file=os.path.join(ddir, "img_cap_v_2_class_self.json"))
    for ref_split, our_split in zip(ref_out, our_out):
        _cmp_examples(ref_split, our_split)
    # the fixture must actually produce data in each split unfiltered
    if not filtering:
        assert all(len(s) for s in ref_out)


def _write_flickr_fixture(tmp_path):
    """Annotations XML + bracketed Sentences + karpathy-style split json."""
    ent = tmp_path / "flickr30k_entities"
    (ent / "Annotations").mkdir(parents=True, exist_ok=True)
    (ent / "Sentences").mkdir(parents=True, exist_ok=True)

    def xml_file(name, objs):
        body = "".join(
            "<object>%s%s</object>" % (
                "".join("<name>%s</name>" % n for n in names),
                ("<bndbox><xmin>%d</xmin><ymin>%d</ymin>"
                 "<xmax>%d</xmax><ymax>%d</ymax></bndbox>" % box
                 if box else ""))
            for names, box in objs)
        with open(ent / "Annotations" / (name + ".xml"), "w") as f:
            f.write("<annotation>%s</annotation>" % body)

    def sent_file(name, lines):
        with open(ent / "Sentences" / (name + ".txt"), "w",
                  encoding="utf-8") as f:
            f.write("\n".join(lines))

    # XML <name> entries are EN#ids, as in the real Flickr30k Entities
    # Annotations. image 100: entity 1 has two boxes (repeated name),
    # entity 2 has two name aliases sharing one box.
    xml_file("100", [ (["1"], (1, 2, 30, 40)),
                      (["2", "20"], (5, 6, 70, 80)),
                      (["1"], (9, 9, 20, 20)) ])
    sent_file("100", [
        "[/EN#1/people A man] rides [/EN#2/vehicles a red bike] .",
        "[/EN#7/other Nobody] here .",          # unknown entity -> det 0
        "Plain caption with no brackets .",     # no matches -> dropped
    ])
    # image 200: punctuation-heavy caption + entity without detections
    xml_file("200", [ (["1"], (2, 3, 40, 50)) ])
    sent_file("200", [
        "[/EN#1/animals The dog] chases , [/EN#9/animals the cat] -- fast .",
        "[/EN#1/animals A dog] sleeps .",
    ])
    # image 300 (test split): det-filter candidates
    xml_file("300", [ (["1"], (0, 0, 10, 10)) ])
    sent_file("300", [
        "[/EN#1/vehicles A train] arrives .",
        "[/EN#1/vehicles The train] leaves .",
    ])
    ann = {"images": [
        {"filename": "100.jpg", "split": "train"},
        {"filename": "200.jpg", "split": "val"},
        {"filename": "300.jpg", "split": "test"},
    ]}
    ann_path = tmp_path / "dataset_flickr30k.json"
    with open(ann_path, "w") as f:
        json.dump(ann, f)

    vdir = tmp_path / "datasets" / "flickr"
    vdir.mkdir(parents=True, exist_ok=True)
    cap_2_verb = {   # keys keep original case (Flickr never lowercases)
        "100": {"A man rides a red bike": ["ride"],
                "Nobody here": []},
        "200": {"The dog chases the cat fast": ["chase"],
                "A dog sleeps": []},               # dropped by verb filter
        "300": {"A train arrives": ["arrive"], "The train leaves": ["leave"]},
    }
    with open(vdir / "cap_2_verb_nv.json", "w") as f:
        json.dump(cap_2_verb, f)
    sdir = tmp_path / "saved_data" / "flickr"
    sdir.mkdir(parents=True, exist_ok=True)
    det_map = {"300": ["A train arrives"]}         # "The train leaves" drops
    with open(sdir / "img_cap_v_2_idbox_flickr.json", "w") as f:
        json.dump(det_map, f)
    return str(ann_path), str(ent), str(vdir), str(sdir)


def _cmp_flickr(ref_split, our_split):
    assert len(ref_split) == len(our_split)
    for r, o in zip(ref_split, our_split):
        assert r.image == o.image
        assert r.text == o.text
        assert tuple(r.detection[0]) == tuple(o.detection[0])
        assert tuple(r.detection[1]) == tuple(o.detection[1])  # bdnboxes
        assert list(r.detection[2]) == list(o.detection[2])    # det_ids


@pytest.mark.parametrize("verb_filter,det_filter", [
    (False, False), (True, False), (False, True)])
def test_flickr_entities_golden(tmp_path, ref_dataset_mod, verb_filter,
                                det_filter):
    from vsrcic_tpu.data import FlickrEntities

    ann_path, ent_root, vdir, sdir = _write_flickr_fixture(tmp_path)
    old = os.getcwd()
    os.chdir(str(tmp_path))
    try:
        # unbound call: the reference method never touches self
        ref_out = ref_dataset_mod.FlickrEntities.get_samples(
            None, ann_path, "imgs", ent_root, verb_filter=verb_filter,
            det_filter=det_filter)
    finally:
        os.chdir(old)
    our_out = FlickrEntities.get_samples(
        ann_path, "imgs", ent_root, verb_filter=verb_filter,
        det_filter=det_filter,
        verb_filter_file=os.path.join(vdir, "cap_2_verb_nv.json"),
        det_filter_file=os.path.join(sdir, "img_cap_v_2_idbox_flickr.json"))
    for ref_split, our_split in zip(ref_out, our_out):
        _cmp_flickr(ref_split, our_split)
    if not (verb_filter or det_filter):
        assert all(len(s) for s in ref_out)
