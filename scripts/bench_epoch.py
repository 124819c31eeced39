"""Composed XE training-epoch benchmark: the number a user actually gets.

BASELINE.md's `bench_xe.py` rows measure the device step with staged
inputs; `bench_ingest.py` measures the host gather alone. This script
composes the REAL training loop exactly as `vsrcic_tpu.cli.train` runs it
— DataLoader (native C++ packed gather) -> PrefetchLoader(depth=2) ->
TextField.process -> jitted CaptionerXETrainer.step — over a
reference-scale packed store (100-det images, 2048-d features, ref
coco_scripts/train.py:99 + data/field.py:70-73), and reports:

  * end-to-end epoch examples/s (the composed number),
  * ingest-only ex/s (loader drained, no device work),
  * step-only ex/s (device-resident repeat of one batch),
  * the overlap factor  t_end2end / (t_ingest + t_step)  — 1.0 means the
    prefetch thread hid nothing, 0.5 means perfect overlap.

    python scripts/bench_epoch.py [--images 4096] [--batch 1024]
                                  [--dtype float32|bfloat16] [--epochs 2]

One JSON line per configuration; the LAST epoch (warm page cache — the
steady state of a multi-epoch run) is the reported number.
"""
import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np


def materialize_packed(world, tmp, dets=100, dtype="float32"):
    """Write the synthetic world's detections as a reference-scale packed
    store (ClassSeededStore regenerated at `dets` detections/image)."""
    from vsrcic_tpu.data.store import packed_dtype
    from vsrcic_tpu.data.synthetic import ClassSeededStore

    gen = ClassSeededStore(world.store.image_classes,
                           world.store.n_classes,
                           feat_dim=world.store.feat_dim, n_dets=dets,
                           seed=world.store.seed)
    ids = sorted(world.store.image_classes.keys())
    np_dtype = packed_dtype(dtype)
    rows = len(ids) * dets
    dim = world.store.feat_dim
    ncls = world.store.n_classes
    feat = np.memmap(os.path.join(tmp, "features.bin"), np_dtype, "w+",
                     shape=(rows, dim))
    prob = np.memmap(os.path.join(tmp, "cls_probs.bin"), np_dtype, "w+",
                     shape=(rows, ncls))
    box = np.memmap(os.path.join(tmp, "boxes.bin"), np.float32, "w+",
                    shape=(rows, 4))
    index = {}
    for k, img_id in enumerate(ids):
        rec = gen.get(img_id)
        s = k * dets
        feat[s:s + dets] = rec.features.astype(np_dtype)
        prob[s:s + dets] = rec.cls_probs.astype(np_dtype)
        box[s:s + dets] = rec.boxes
        index[str(img_id)] = [s, dets]
    feat.flush(); prob.flush(); box.flush()
    with open(os.path.join(tmp, "index.json"), "w") as f:
        json.dump({"index": index, "feat_dim": dim, "n_classes": ncls,
                   "n_total_rows": rows, "dtype": dtype}, f)
    from vsrcic_tpu.data import PackedFeatureStore
    return PackedFeatureStore(tmp)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--dets", type=int, default=100)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from vsrcic_tpu.cli.common import build_coco_world
    from vsrcic_tpu.data import (COCOControlSequenceField, DataLoader,
                                 ImageDetectionsField, PairedDataset,
                                 PrefetchLoader, RawField)
    from vsrcic_tpu.models.captioner import (CaptionerConfig,
                                             init_captioner_params)
    from vsrcic_tpu.train import CaptionerXETrainer

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    if not on_tpu:                      # CPU smoke: tiny everything
        args.images = min(args.images, 64)
        args.batch = min(args.batch, 16)
        args.dets = min(args.dets, 10)

    class Opt:                          # build_world's argparse surface
        synthetic = True
        synthetic_images = args.images
        feat_dim = 2048 if on_tpu else 64
        seed = 1234
        dataset = "coco"

    world = build_coco_world(Opt)
    tf = world.text_field
    train_ex = world.splits[0]

    tmp = tempfile.mkdtemp(prefix="epoch_bench_")
    t0 = time.perf_counter()
    store = materialize_packed(world, tmp, dets=args.dets, dtype=args.dtype)
    print("materialized %d-image packed store (%s) in %.1fs"
          % (args.images, args.dtype, time.perf_counter() - t0),
          file=sys.stderr)

    image_field = ImageDetectionsField(store, max_detections=args.dets)
    det_field = COCOControlSequenceField(
        store, classes_path=world.classes, padding_idx=-1, all_boxes=False,
        fix_length=20, compact=True, image_max_detections=args.dets)
    ds = PairedDataset(train_ex, {"image": image_field,
                                  "detection": det_field,
                                  "text": RawField()})

    cfg = CaptionerConfig(
        seq_len=20, vocab_size=len(tf.vocab), bos_idx=tf.bos_idx,
        det_feat_size=Opt.feat_dim,
        input_encoding_size=1000 if on_tpu else 16,
        rnn_size=1000 if on_tpu else 16, att_size=512 if on_tpu else 8)
    params = init_captioner_params(jax.random.PRNGKey(0), cfg)
    trainer = CaptionerXETrainer(cfg, params, lr=5e-4)

    def _stage(batch):
        # mirror cli/train.py: the producer thread dispatches the async
        # device_put of the dominant tensor so batch k+1's copy rides
        # under batch k's step
        (dets, ids), det_out, caps = batch
        return (jax.device_put(dets), ids), det_out, caps

    def epoch(run_step=True, loader_only=False):
        from vsrcic_tpu.data import DevicePrefetchLoader
        base_loader = DataLoader(ds, batch_size=args.batch, shuffle=True,
                                 seed=7)
        loader = (PrefetchLoader(base_loader, depth=2) if loader_only
                  else DevicePrefetchLoader(base_loader, _stage, depth=2))
        n = 0
        losses = []
        t0 = time.perf_counter()
        for (dets, _), det_out, caps in loader:
            n += dets.shape[0]
            if loader_only:
                continue
            det_seqs, gate_gts, _, _ = det_out
            cap_ids = tf.process(list(caps))
            loss, _, _ = trainer.step(dets, cap_ids, det_seqs, gate_gts)
            losses.append(loss)
        if losses:
            float(losses[-1])           # drain the async dispatch queue
        dt = time.perf_counter() - t0
        print("  pass(%s) %d ex in %.1fs (%.1f ex/s)"
              % ("ingest" if loader_only else "e2e", n, dt, n / dt),
              file=sys.stderr, flush=True)
        return n, dt

    # compile + cold-cache pass, then timed warm epochs
    out = {"metric": "xe_epoch_examples_per_sec", "unit": "examples/s",
           "batch": args.batch, "dets": args.dets, "dtype": args.dtype,
           "images": args.images}
    n, dt = epoch()
    out["cold_ex_per_s"] = round(n / dt, 1)
    for _ in range(args.epochs - 1):
        n, dt = epoch()
    out["value"] = round(n / dt, 1)

    # components for the overlap factor (same warm cache)
    n_i, dt_i = epoch(loader_only=True)
    out["ingest_only_ex_per_s"] = round(n_i / dt_i, 1)
    # step-only: device-resident repeat of one staged batch
    loader = PrefetchLoader(DataLoader(ds, batch_size=args.batch), depth=2)
    (dets, _), det_out, caps = next(iter(loader))
    det_seqs, gate_gts, _, _ = det_out
    cap_ids = tf.process(list(caps))
    dets_d = jnp.asarray(dets)
    seqs_d = jnp.asarray(det_seqs)
    gate_d = jnp.asarray(gate_gts)
    trainer.step(dets_d, cap_ids, seqs_d, gate_d)
    steps = max(1, n // dets.shape[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        loss, _, _ = trainer.step(dets_d, cap_ids, seqs_d, gate_d)
    float(loss)
    dt_s = time.perf_counter() - t0
    out["step_only_ex_per_s"] = round(steps * dets.shape[0] / dt_s, 1)
    out["overlap_factor"] = round(dt / (dt_i + dt_s), 3)
    print(json.dumps(out))
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    from vsrcic_tpu.utils.retry import with_backend_retry

    with_backend_retry(main, attempts=5, label="bench_epoch",
                       probe_timeout=150.0)
