"""Interleaved e2e A/B: dense-beam logprob records — nested take_along over
a pre-masked (B, K, V) block vs one flat (K*V) gather + mask on the K
selected values (VSRCIC_REC_FLAT / ControllableCaptioner.beam_rec_flat).

This targets the STRICT decode path (the eval CLI's parity default: no
fused kernels, no bf16 tables, dense joint top-k) where the old form
materializes two (B, K, V) intermediates per step (w * mask ~200 MB at
batch 1024 and the row-gathered (B, K, V) block) purely to record K
logprobs. Bit-exact either way (tests/test_beam_more.py::
test_rec_flat_bit_exact); per the round-4 img_y lesson the adoption
decision comes from this interleaved on-chip A/B, not the argument.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from vsrcic_tpu.models.api import ControllableCaptioner
    from vsrcic_tpu.models.captioner import CaptionerConfig

    batch, beam = 1024, 5
    cfg = CaptionerConfig(seq_len=20, vocab_size=10000, bos_idx=2,
                          det_feat_size=2048, input_encoding_size=1000,
                          rnn_size=1000, att_size=512)
    L, M, N_DET = 10, 20, 50
    key = jax.random.PRNGKey(0)
    kd, kg, kv, kvid = jax.random.split(key, 4)
    detections = jax.random.normal(kd, (batch, N_DET, cfg.det_feat_size),
                                   jnp.float32)
    det_groups = jax.random.normal(kg, (batch, L, M, cfg.det_feat_size),
                                   jnp.float32)
    verb_list = jnp.where(
        jax.random.uniform(kv, (batch, L)) < 0.15,
        jax.random.randint(kvid, (batch, L), 1, 150), -1).astype(jnp.int32)

    runners = []
    ref = None
    for name, flat in (("nested-rec", "0"), ("flat-rec", "1")):
        os.environ["VSRCIC_REC_FLAT"] = flat    # honored at construction
        cap = ControllableCaptioner(
            cfg, key=key,
            verb_2_vob_all={str(i): [5 + i, 40 + i] for i in range(1, 200)})

        def run(cap=cap):
            return cap.beam_search_v(detections, det_groups, verb_list,
                                     eos_word=3, beam_size=beam)
        r = run()
        jax.block_until_ready(r.words)
        if ref is None:
            ref = r
        else:
            ok = all(bool(jnp.array_equal(a, b)) for a, b in zip(r, ref))
            print("%s result_match=%s" % (name, ok), flush=True)
            assert ok, "flat-rec diverged from the nested form"
        runners.append((name, run))
    os.environ.pop("VSRCIC_REC_FLAT", None)

    iters, rounds = 5, 4
    times = {n: [] for n, _ in runners}
    for rd in range(rounds):
        for name, run in runners:
            jax.block_until_ready(run().words)
            t0 = time.perf_counter()
            outs = [run() for _ in range(iters)]
            jax.block_until_ready([o.words for o in outs])
            dt = (time.perf_counter() - t0) / iters
            times[name].append(dt)
            print("round %d %-10s %7.2f ms/decode  %7.1f caps/s"
                  % (rd, name, dt * 1e3, batch / dt), flush=True)
    print("--- medians ---")
    for name, ts in times.items():
        ts = sorted(ts)
        med = ts[len(ts) // 2]
        print("%-10s median %7.2f ms  %7.1f caps/s" % (name, med * 1e3,
                                                       batch / med))


if __name__ == "__main__":
    main()
