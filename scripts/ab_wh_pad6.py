"""Interleaved e2e A/B: 5R h-side fused matmul + two slice-adds vs a
6R zero-padded h-side matmul + one full-width add (VSRCIC_WH_PAD6).

The post-8044 profile charges ~0.24 ms/step to the 'x-proj slice-add'
elementwise passes that stitch y_x (B, 6R) and y_h (B, 5R) together
(models/captioner.py::_fused_input1_block). Padding wh with a zero R-row
block at [R, 2R) makes y_x + y_h a single (B, 6R) add the compiler can
keep in the matmul epilogue, at the cost of one extra (B, R) x (R, R)
matmul block (~0.06 ms at the measured 150-178 TFLOP/s). Both forms are
bit-exact (the pad contributes +0.0; asserted below on full decodes).

Per the round-4 img_y lesson (a profiler slice name is a hypothesis, not
a cause), this runs interleaved rounds on one chip before any adoption.
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
    det_groups = jnp.pad(
        jax.random.normal(kg, (batch, L, M, cfg.det_feat_size), jnp.float32)
        .astype(jnp.bfloat16), [(0, 0), (0, 0), (0, (-M) % 8), (0, 0)])
    verb_list = jnp.where(
        jax.random.uniform(kv, (batch, L)) < 0.15,
        jax.random.randint(kvid, (batch, L), 1, 150), -1).astype(jnp.int32)

    runners = []
    ref_words = None
    for name, pad6 in (("slice-add", "0"), ("wh-pad6", "1")):
        os.environ["VSRCIC_WH_PAD6"] = pad6     # read at derive time
        cap = ControllableCaptioner(
            cfg, key=key,
            verb_2_vob_all={str(i): [5 + i, 40 + i] for i in range(1, 200)},
            use_fused_attention=True, table_dtype=jnp.bfloat16,
            use_vocab_topk=True)

        def run(cap=cap):
            return cap.beam_search_v(detections, det_groups, verb_list,
                                     eos_word=3, beam_size=beam).words
        w = run()
        jax.block_until_ready(w)
        if ref_words is None:
            ref_words = w
        else:
            match = bool(jnp.array_equal(w, ref_words))
            print("%s words_match=%s" % (name, match), flush=True)
            assert match, "wh-pad6 diverged from the slice-add form"
        runners.append((name, run))
    os.environ.pop("VSRCIC_WH_PAD6", None)

    iters, rounds = 10, 4
    times = {n: [] for n, _ in runners}
    for rd in range(rounds):
        for name, run in runners:
            outs = [run()]
            jax.block_until_ready(outs)
            t0 = time.perf_counter()
            outs = [run() for _ in range(iters)]
            jax.block_until_ready(outs)
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
