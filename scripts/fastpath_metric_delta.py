"""Bound the decode fast path's corpus-metric impact (verdict r3 item 3).

bench.py's headline config enables bf16 statics tables + the streaming
vocab top-k candidate beam (+ the fused attention kernel on TPU), while
cli/eval.py defaults strict — the fast path's fidelity was previously
measured only at token level (99.72% match on-chip). This script measures
what the fast knobs do to the CORPUS METRICS the reference reports
(ref coco_scripts/eval_coco.py:269-287):

  1. train a small-but-non-degenerate captioner on the synthetic backend,
  2. decode the same test set twice through cli/eval.py — strict, then
     fast (--bf16_tables --vocab_topk [+ --fused on TPU]),
  3. score both against GT with the native CIDEr/BLEU/ROUGE/METEOR and
     report per-metric deltas + exact-caption agreement.

On CPU the vocab-topk knob maps to the XLA candidate-beam variant (the
same candidate-narrowing semantics as the Pallas kernel, which is
interpret-parity tested separately) and bf16 tables are real bf16 casts,
so the numerics sources of a metric delta are represented; re-run on a
live TPU chip for the headline-config numbers (same command).

    python scripts/fastpath_metric_delta.py [--images 48] [--epochs 6]
"""
import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, ".")


def read_dump(path):
    gen, gts = {}, {}
    with open(path) as f:
        for line in f:
            d = json.loads(line)
            gen[d["i"]] = [d["pred"]]
            gts[d["i"]] = [d["gt"]]
    return gen, gts


def score(gen, gts):
    from vsrcic_tpu.metrics import Bleu, Cider, NativeMeteor, Rouge
    from vsrcic_tpu.text import ptb_tokenize

    gts_t, gen_t = ptb_tokenize(gts), ptb_tokenize(gen)
    out = {}
    bleu, _ = Bleu(4).compute_score(gts_t, gen_t)
    for i, b in enumerate(bleu):
        out["Bleu_%d" % (i + 1)] = b
    out["ROUGE_L"], _ = Rouge().compute_score(gts_t, gen_t)
    out["CIDEr"], _ = Cider().compute_score(gts_t, gen_t)
    out["METEOR"], _ = NativeMeteor().compute_score(gts_t, gen_t)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=48)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--rnn_size", type=int, default=32)
    ap.add_argument("--att_size", type=int, default=None,
                    help="default: 128 on TPU (so --fused passes the"
                    " kernel's 128-lane alignment and the delta covers the"
                    " kernel), 16 on CPU; api.py falls back to the XLA step"
                    " for unaligned sizes, so an explicit unaligned value"
                    " on TPU gets a loud notice")
    ap.add_argument("--platform", type=str, default=None,
                    help="cpu to force CPU; default = whatever jax has")
    args = ap.parse_args()

    from vsrcic_tpu.cli import eval as eval_cli
    from vsrcic_tpu.cli import train as train_cli

    if args.platform:
        on_tpu = args.platform != "cpu"
    else:
        # resolve the real backend so the TPU re-run includes --fused
        # (probe is hang-safe; a dead tunnel fails fast with a diagnostic)
        from vsrcic_tpu.utils.retry import probe_backend
        on_tpu = probe_backend(timeout=150.0) != "cpu"
    if args.att_size is None:
        args.att_size = 128 if on_tpu else 16
    elif on_tpu and args.att_size % 128:
        print("NOTICE: --att_size=%d is not 128-aligned, so --fused will"
              " fall back to the XLA step and the fast/strict delta will"
              " NOT cover the Pallas kernel." % args.att_size,
              file=sys.stderr)
    tiny = ["--synthetic", "--synthetic_images", str(args.images),
            "--batch_size", "16", "--seed", "7",
            "--rnn_size", str(args.rnn_size), "--att_size",
            str(args.att_size),
            "--input_encoding_size", "32"]
    if args.platform:
        tiny += ["--platform", args.platform]

    with tempfile.TemporaryDirectory() as td:
        ckpt_root = os.path.join(td, "saved")
        train_cli.main(["--dataset", "coco", "--checkpoint_path", ckpt_root,
                        "--max_epochs", str(args.epochs)] + tiny)
        best = os.path.join(ckpt_root, "coco_cap", "exp_best")

        dumps = {}
        for name, knobs in (("strict", []),
                            ("fast", ["--bf16_tables", "--vocab_topk"]
                             + (["--fused"] if on_tpu else []))):
            dump = os.path.join(td, name + ".jsonl")
            eval_cli.main(["--dataset", "coco", "--captioner_ckpt", best,
                           "--dump_preds", dump] + knobs + tiny)
            dumps[name] = dump

        (gen_s, gts), (gen_f, _) = (read_dump(dumps["strict"]),
                                    read_dump(dumps["fast"]))
        n = len(gen_s)
        agree = sum(gen_s[i][0] == gen_f[i][0] for i in gen_s)
        ms, mf = score(gen_s, gts), score(gen_f, gts)
        deltas = {k: mf[k] - ms[k] for k in ms}
        print(json.dumps({
            "n_captions": n,
            "caption_agreement": agree / max(n, 1),
            "strict": {k: round(v, 6) for k, v in ms.items()},
            "fast": {k: round(v, 6) for k, v in mf.items()},
            "delta_fast_minus_strict": {k: round(v, 6)
                                        for k, v in deltas.items()},
        }, indent=2))


if __name__ == "__main__":
    main()
