"""Flickr captioner-training extension: FlickrControlSequenceField + CLI.

The reference ships no Flickr captioner-training script (SURVEY.md S7) — its
flickr checkpoint is pretrained — so these tests pin the extension's own
contract: COCO training-control semantics (reference data/field.py:15-110)
on Flickr entity annotations with best-IoU box matching (ref :1171-1196).
"""
import numpy as np
import pytest

# heavyweight (~42s on a 1-core host) — excluded from the smoke tier,
# run via the full matrix: `python -m pytest tests/`
pytestmark = pytest.mark.slow

from vsrcic_tpu.data import FlickrControlSequenceField
from vsrcic_tpu.data.synthetic_flickr import SyntheticFlickr


@pytest.fixture(scope="module")
def syn():
    return SyntheticFlickr(n_images=6, n_val=2, n_test=2, feat_dim=32,
                           seed=0)


def test_field_outputs(syn):
    field = FlickrControlSequenceField(syn.store, padding_idx=-1,
                                       fix_length=20, compact=False,
                                       image_max_detections=100)
    ex = syn.sample_splits[0][0]
    seqs, gate, seqs_test, dedup = field.preprocess(ex.detection)
    assert seqs.shape == (20, 20, 32)
    assert seqs_test.shape == (20, 20, 32)
    assert gate.shape == (20,)
    # synthetic captions are "a X verbs a Y": det_ids [0,1,0,0,2]
    # ent_seq = [1,1,2,2,2] -> gate flips exactly at the 1->2 boundary
    assert gate[1] == 1 and gate[0] == 0 and gate[2] == 0
    # eos columns appended after the caption
    assert gate[5] == -1 and gate[6] == -1
    assert dedup == "1 2"
    # the two test-time groups must differ (different entities)
    assert not np.array_equal(seqs_test[0], seqs_test[1])
    # tail is filled with the last group (sorting=False semantics)
    assert np.array_equal(seqs_test[2], seqs_test[1])
    assert np.array_equal(seqs_test[19], seqs_test[1])


def test_field_compact_matches_dense(syn):
    dense = FlickrControlSequenceField(syn.store, padding_idx=-1,
                                       fix_length=20, compact=False,
                                       image_max_detections=100)
    compact = FlickrControlSequenceField(syn.store, padding_idx=-1,
                                         fix_length=20, compact=True,
                                         image_max_detections=100)
    from vsrcic_tpu.data.fields_flickr import flickr_image_id

    for ex in syn.sample_splits[0][:4]:
        seqs, gate_d, seqs_test, _ = dense.preprocess(ex.detection)
        ids, gate_c, ids_test, _ = compact.preprocess(ex.detection)
        np.testing.assert_array_equal(gate_d, gate_c)
        feats = syn.store.get(flickr_image_id(ex.image)).features
        for id_grid, dense_grid in ((ids, seqs), (ids_test, seqs_test)):
            expanded = np.where(
                (id_grid >= 0)[..., None],
                feats[np.clip(id_grid, 0, len(feats) - 1)], 0.0)
            np.testing.assert_allclose(expanded, dense_grid, atol=1e-6)


def test_train_cli_flickr_xe_smoke(tmp_path):
    from vsrcic_tpu.cli.train import main
    main(["--dataset", "flickr", "--synthetic", "--batch_size", "4",
          "--max_steps", "2", "--max_epochs", "1", "--platform", "cpu",
          "--feat_dim", "32", "--synthetic_images", "8",
          "--checkpoint_path", str(tmp_path)])
    import os
    assert os.path.isdir(str(tmp_path) + "/flickr_cap")
