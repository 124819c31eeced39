"""Interleaved e2e A/B of the fused-attention DMA depth (rows_per_block).

The kernel now issues every row's group copy before waiting; rows_per_block
sets how many copies ride in flight. Times full beam-5 decodes per setting
in alternating rounds (same methodology as ab_vocab_e2e.py).
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
    kd, kg, kv = jax.random.split(key, 3)
    detections = jax.random.normal(kd, (batch, N_DET, cfg.det_feat_size),
                                   jnp.float32)
    det_groups = jnp.pad(
        jax.random.normal(kg, (batch, L, M, cfg.det_feat_size), jnp.float32)
        .astype(jnp.bfloat16), [(0, 0), (0, 0), (0, (-M) % 8), (0, 0)])
    verb_list = jnp.where(
        jax.random.uniform(kv, (batch, L)) < 0.15,
        jax.random.randint(kv, (batch, L), 1, 150), -1).astype(jnp.int32)

    runners = []
    ref_words = None
    for rpb in (int(x) for x in
                os.environ.get("VSRCIC_AB_RPB", "8,16,32").split(",")):
        os.environ["VSRCIC_FUSED_RPB"] = str(rpb)
        cap = ControllableCaptioner(
            cfg, key=key,
            verb_2_vob_all={str(i): [5 + i, 40 + i] for i in range(1, 200)},
            use_fused_attention=True, table_dtype=jnp.bfloat16,
            use_vocab_topk=True)

        def run(cap=cap):
            return cap.beam_search_v(detections, det_groups, verb_list,
                                     eos_word=3, beam_size=beam).words
        try:
            w = run()
            jax.block_until_ready(w)
        except Exception as e:
            print("rpb=%d FAIL %s" % (rpb, str(e).split("\n")[0][:120]),
                  flush=True)
            continue
        if ref_words is None:
            ref_words = w
        else:
            print("rpb=%d words_match=%s"
                  % (rpb, bool(jnp.array_equal(w, ref_words))), flush=True)
        runners.append((rpb, run))

    iters, rounds = 10, 4
    times = {r: [] for r, _ in runners}
    for rd in range(rounds):
        for rpb, run in runners:
            outs = [run()]
            jax.block_until_ready(outs)
            t0 = time.perf_counter()
            outs = [run() for _ in range(iters)]
            jax.block_until_ready(outs)
            dt = (time.perf_counter() - t0) / iters
            times[rpb].append(dt)
            print("round %d rpb=%-3d %7.2f ms/decode  %7.1f caps/s"
                  % (rd, rpb, dt * 1e3, batch / dt), flush=True)
    print("--- medians ---")
    for rpb, ts in times.items():
        ts = sorted(ts)
        med = ts[len(ts) // 2]
        print("rpb=%-3d median %7.2f ms  %7.1f caps/s  min %7.2f ms"
              % (rpb, med * 1e3, batch / med, ts[0] * 1e3))


if __name__ == "__main__":
    main()
