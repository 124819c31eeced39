"""Host ingest benchmark: packed-store DataLoader throughput (native C++
batched gather vs per-item numpy path) at XE training shapes (100-det
images, 2048-d features).

Verdict criterion (round 2, item 4): ingest must sustain the measured XE
compute rate (2634 ex/s at batch 512) so the loader never starves the chip.

    python scripts/bench_ingest.py [--images 2048] [--batch 512]
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np


def build_store(root, n_images, dets=100, dim=2048, dtype="float32"):
    """Write a packed store directly (features.bin memmap + index)."""
    from vsrcic_tpu.data.store import packed_dtype
    np_dtype = packed_dtype(dtype)
    rows = n_images * dets
    feat = np.memmap(os.path.join(root, "features.bin"), np_dtype, "w+",
                     shape=(rows, dim))
    prob = np.memmap(os.path.join(root, "cls_probs.bin"), np_dtype, "w+",
                     shape=(rows, 4))
    box = np.memmap(os.path.join(root, "boxes.bin"), np.float32, "w+",
                    shape=(rows, 4))
    rng = np.random.RandomState(0)
    chunk = rng.rand(dets, dim).astype(np_dtype)
    index = {}
    for i in range(n_images):
        feat[i * dets:(i + 1) * dets] = chunk
        index[str(i + 1)] = [i * dets, dets]
    prob[:] = np_dtype.type(0.5)
    box[:] = 0.5
    feat.flush(); prob.flush(); box.flush()
    with open(os.path.join(root, "index.json"), "w") as f:
        json.dump({"index": index, "feat_dim": dim, "n_classes": 4,
                   "n_total_rows": rows, "dtype": dtype}, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--dets", type=int, default=100)
    ap.add_argument("--dtype", default="float32",
                    help="at-rest feature dtype (bfloat16 halves the "
                    "gather's memcpy bytes; features feed the TPU as bf16)")
    args = ap.parse_args()

    from vsrcic_tpu.data import (DataLoader, ImageDetectionsField,
                                 PackedFeatureStore, PairedDataset, RawField)
    from vsrcic_tpu.data.dataset import Example
    from vsrcic_tpu.data.native_reader import native_available

    tmp = tempfile.mkdtemp(prefix="ingest_bench_")
    build_store(tmp, args.images, dets=args.dets, dtype=args.dtype)
    store = PackedFeatureStore(tmp)
    field = ImageDetectionsField(store, max_detections=args.dets)
    examples = [Example.fromdict(
        {"image": "imgs/COCO_train2014_%012d.jpg" % i, "text": "x"})
        for i in range(1, args.images + 1)]
    ds = PairedDataset(examples, {"image": field, "text": RawField()})

    out = {"native_available": native_available(), "batch": args.batch,
           "dets": args.dets, "dtype": args.dtype}

    def run(label):
        loader = DataLoader(ds, batch_size=args.batch)
        n = 0
        next(iter(loader))  # touch pages once
        t0 = time.perf_counter()
        for (feats, ids), _ in loader:
            n += feats.shape[0] if hasattr(feats, "shape") else len(feats)
        dt = time.perf_counter() - t0
        out[label + "_ex_per_s"] = round(n / dt, 1)

    run("batched")                       # preprocess_batch (native gather)
    saved = ImageDetectionsField.preprocess_batch
    delattr(ImageDetectionsField, "preprocess_batch")
    try:
        run("per_item")                  # DataLoader falls back per example
    finally:
        ImageDetectionsField.preprocess_batch = saved
    print(json.dumps(out))


if __name__ == "__main__":
    main()
