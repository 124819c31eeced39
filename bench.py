"""Benchmark: beam-5 joint decode throughput of the flagship captioner.

Prints ONE JSON line:
  {"metric": "captions_per_sec_per_chip_beam5", "value": N,
   "unit": "captions/s/chip", "vs_baseline": N}

vs_baseline is measured against the BASELINE.json north star of >=10k
captions/s on a v5e-8, i.e. 1250 captions/s/chip.

Runs on whatever device jax selects (the driver runs it on one real TPU
chip). Model dims mirror the reference captioner (det 2048, embed/rnn 1000,
att 512, vocab ~10k, seq 20 — controllable_captioning.py:11) with realistic
control shapes (10 region groups x 20 regions).
"""
import json
import time


BASELINE_PER_CHIP = 1250.0


def _attempt():
    # probe init in a killable subprocess first: a hung tunnel (relay
    # process dead) blocks jax.devices() in C++ forever and cannot be
    # interrupted in-process — the probe converts a hang into a bounded,
    # retry-classified error so the bench fails fast instead of stalling
    # the driver capture
    from vsrcic_tpu.utils.retry import probe_backend
    probe_backend(timeout=150.0)

    import jax
    import jax.numpy as jnp
    from vsrcic_tpu.models.api import ControllableCaptioner
    from vsrcic_tpu.models.captioner import CaptionerConfig

    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)

    # batch 1024 measured best post-megakernel (weights are read once per
    # decode step, so captions per weight-read scale with batch: 256->3081,
    # 512->3860, 1024->4356, 2048->4315 caps/s; docs/ENGINEERING_NOTES.md)
    import os as _os
    batch = (int(_os.environ.get("VSRCIC_BENCH_BATCH", "1024"))
             if on_tpu else 4)
    beam = 5
    cfg = CaptionerConfig(seq_len=20, vocab_size=10000, bos_idx=2,
                          det_feat_size=2048, input_encoding_size=1000,
                          rnn_size=1000, att_size=512)
    L, M, N_DET = 10, 20, 50

    key = jax.random.PRNGKey(0)
    import os
    raw = os.environ.get("VSRCIC_VOCAB_TOPK", "1")
    vocab_topk = {"0": False, "1": True, "xla": "xla"}.get(raw)
    if vocab_topk is None:
        raise SystemExit("VSRCIC_VOCAB_TOPK must be one of 0|1|xla, got %r"
                         % raw)
    captioner = ControllableCaptioner(
        cfg, key=key,
        verb_2_vob_all={str(i): [5 + i, 40 + i] for i in range(1, 200)},
        use_fused_attention=bool(int(os.environ.get("VSRCIC_FUSED_ATT", "1")))
        and on_tpu,
        table_dtype=jnp.bfloat16 if on_tpu else None,
        use_vocab_topk=vocab_topk if on_tpu else False,
        step_dtype=(jnp.bfloat16 if on_tpu and bool(int(
            os.environ.get("VSRCIC_STEP_BF16", "0"))) else None))

    kd, kg, kv = jax.random.split(key, 3)
    detections = jax.random.normal(kd, (batch, N_DET, cfg.det_feat_size),
                                   jnp.float32)
    det_groups = jax.random.normal(kg, (batch, L, M, cfg.det_feat_size),
                                   jnp.float32)
    if on_tpu:
        # production layout: the eval pipeline hands the beam det_groups
        # already bf16-cast and M-padded to the fused kernel's 8-row tiling
        # (EvalPipeline emits recons that way); bench inputs match so the
        # measured program is the production one
        det_groups = jnp.pad(det_groups.astype(jnp.bfloat16),
                             [(0, 0), (0, 0), (0, (-M) % 8), (0, 0)])
    verb_list = jnp.where(
        jax.random.uniform(kv, (batch, L)) < 0.15,
        jax.random.randint(kv, (batch, L), 1, 150), -1).astype(jnp.int32)

    def run():
        res = captioner.beam_search_v(detections, det_groups, verb_list,
                                      eos_word=3, beam_size=beam)
        return res.words

    run().block_until_ready()  # compile
    n_iters = 10 if on_tpu else 2
    # sustained throughput: batches are submitted back to back (async
    # dispatch queues them on device) and synced once at the end — the
    # eval CLI runs exactly this submit/pending overlap, so per-batch host
    # dispatch (~28 ms here) hides behind device execution as it does in
    # production; blocking every batch would measure latency, not
    # throughput
    outs = []
    t0 = time.perf_counter()
    for _ in range(n_iters):
        outs.append(run())
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / n_iters
    caps_per_sec = batch / dt

    print(json.dumps({
        "metric": "captions_per_sec_per_chip_beam5",
        "value": round(caps_per_sec, 2),
        "unit": "captions/s/chip",
        "vs_baseline": round(caps_per_sec / BASELINE_PER_CHIP, 4),
    }))


def main():
    # The axon tunnel's backend init is known-flaky (BENCH_r03 died at
    # jax.devices() with a transient UNAVAILABLE); retry the whole attempt
    # -- init, staging, compile, timing -- with bounded backoff so one
    # transient error can't lose the round's driver-verified number.
    from vsrcic_tpu.utils.retry import with_backend_retry

    with_backend_retry(_attempt, attempts=5, label="bench")


if __name__ == "__main__":
    main()
