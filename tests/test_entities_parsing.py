"""Real-path parsing: Flickr30k Entities XML/Sentences and COCO annotations."""
import json
import os

import numpy as np

from vsrcic_tpu.data.dataset import (FlickrEntities, coco_get_samples,
                                     COCOEntities, Example)


def test_flickr_parse_image(tmp_path):
    ann = tmp_path / "Annotations"
    sen = tmp_path / "Sentences"
    ann.mkdir()
    sen.mkdir()
    (ann / "123.xml").write_text("""
<annotation>
  <object><name>7</name><bndbox><xmin>10</xmin><ymin>20</ymin><xmax>110</xmax><ymax>120</ymax></bndbox></object>
  <object><name>9</name><bndbox><xmin>30</xmin><ymin>40</ymin><xmax>130</xmax><ymax>140</ymax></bndbox></object>
</annotation>""")
    (sen / "123.txt").write_text(
        "[/EN#7/people A man] rides [/EN#9/animals a horse] .\n"
        "[/EN#7/people The man] waves .\n")
    out = FlickrEntities.parse_image(str(tmp_path), "imgs", "123.jpg",
                                     "train")
    assert len(out) == 2
    ex, split = out[0]
    assert split == "train"
    assert ex.text == "A man rides a horse"
    (pair, bdnboxes, det_ids) = ex.detection
    assert pair[1] == "A man rides a horse"
    # entity ids: man=1, horse=2; words: A man rides a horse
    assert det_ids == [1, 1, 0, 2, 2]
    assert bdnboxes[0] == ((10, 20, 110, 120),)
    assert bdnboxes[1] == ((30, 40, 130, 140),)


def test_coco_get_samples(tmp_path):
    def cap_json(path, anns):
        with open(path, "w") as f:
            json.dump({
                "annotations": [{"id": i, "image_id": img,
                                 "caption": cap}
                                for i, img, cap in anns],
                "images": [{"id": img,
                            "file_name": "COCO_%012d.jpg" % img}
                           for _, img, _ in anns]}, f)

    train_json = str(tmp_path / "captions_train2014.json")
    val_json = str(tmp_path / "captions_val2014.json")
    cap_json(train_json, [(1, 100, "a cat sits"), (2, 101, "a dog runs")])
    cap_json(val_json, [(3, 200, "a bird flies"), (4, 201, "a fish swims")])
    roots = {
        "train": {"img": "tr", "cap": train_json},
        "val": {"img": "vl", "cap": val_json},
        "test": {"img": "vl", "cap": val_json},
    }
    ids = {"train": np.array([1, 2]), "val": np.array([3]),
           "test": np.array([4])}
    train, val, test = coco_get_samples(roots, ids)
    assert [e.text for e in train] == ["a cat sits", "a dog runs"]
    assert [e.text for e in val] == ["a bird flies"]
    assert test[0].image == os.path.join("vl", "COCO_%012d.jpg" % 201)
    # restval-style tuple ids: train ids from train json + extra from val json
    roots2 = dict(roots)
    roots2["train"] = {"img": ("tr", "vl"), "cap": (train_json, val_json)}
    ids2 = dict(ids)
    ids2["train"] = (np.array([1]), np.array([3]))
    train2, _, _ = coco_get_samples(roots2, ids2)
    assert [e.text for e in train2] == ["a cat sits", "a bird flies"]
    assert train2[1].image.startswith("vl")


def test_coco_entities_chunk_alignment_quirks():
    """Alignment drops examples whose grouped det classes undercount chunks
    (ref dataset.py:146-149) and applies the '_' filter for val/test."""
    ents = {"5": {"a red car and a blue car": [["a red car", "car"],
                                              ["a blue car", "car"]]}}
    samples = ([Example.fromdict({"image": "x/COCO_000000000005.jpg",
                                  "text": "a red car and a blue car"})],
               [], [])
    train, val, test = COCOEntities.get_samples(samples, ents)
    # two chunks but a single deduped class -> len(set)==1 < 1? chunks_filtered
    # is {'car'} (len 1), det grouped classes: car,None? 'and a' breaks the
    # group -> ['car','car'] grouped to ['car','car'] (non-consecutive) = 2
    assert len(train) == 1
    det_classes = train[0].detection[1]
    assert det_classes.count("car") == 6  # 'a red car' + 'a blue car' words
