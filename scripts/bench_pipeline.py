"""Pipeline-level benchmark: full EvalPipeline captions/s on one chip.

Measures the COMPLETE eval composition per batch — verb-group extraction,
batched constrained S-SSP generate, batched Sinkhorn + Hungarian rounding,
rank merge, feature permutation, joint beam-5 search — at reference model
sizes (captioner 2048/1000/1000/512 vocab 10k; S_SSP 512/2662; Sinkhorn
2352), vs bench.py which times the beam decode alone.

    python scripts/bench_pipeline.py [--jobs 256] [--iters 5]

Prints one JSON line {"metric": "pipeline_captions_per_sec_per_chip", ...}.
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def make_jobs(n_jobs, L=10, M=20, D=2048, seed=0):
    from vsrcic_tpu.pipelines import CaptionJob
    rng = np.random.RandomState(seed)
    jobs = []
    for p in range(n_jobs):
        control_verb = np.zeros(8)
        seq_v = np.zeros((L, 8))
        seq_sr = np.zeros((L, 8))
        verb_list = np.full((L, 1), -1.0)
        n_verbs = 1 + (p % 2)
        slot = 0
        for vi in range(n_verbs):
            verb = float(1 + (p * 3 + vi) % 150)
            control_verb[vi] = verb
            # each verb: one shared-SR pair (re-rank), one unique, one V slot
            seq_v[slot:slot + 4, 0] = verb
            seq_sr[slot, 0] = 2.0
            seq_sr[slot + 1, 0] = 2.0
            seq_sr[slot + 2, 0] = 7.0 if vi == 0 else 1.0
            seq_sr[slot + 3, 0] = 25.0
            verb_list[slot + 3, 0] = verb
            slot += 4
        n_used = min(slot, L)
        seqs_all = np.zeros((L, M, D), np.float32)
        seqs_all[:n_used] = rng.rand(n_used, M, D).astype(np.float32)
        jobs.append(CaptionJob(
            seqs_vis=rng.rand(L, D).astype(np.float32),
            seqs_txt=rng.rand(L, 300).astype(np.float32),
            seqs_pos=rng.rand(L, 4).astype(np.float32),
            seqs_all=seqs_all, control_verb=control_verb,
            det_seqs_v=seq_v, det_seqs_sr=seq_sr, verb_list=verb_list))
    return jobs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jobs", type=int, default=None,
                    help="captions per batch (default 256 TPU / 4 CPU)")
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--fused", type=int, default=1)
    ap.add_argument("--bf16_tables", type=int, default=1)
    ap.add_argument("--vocab_topk", type=int, default=1)
    ap.add_argument("--fast_ssp", type=int, default=1)
    ap.add_argument("--profile_plan", action="store_true",
                    help="also print a per-slice plan-phase breakdown")
    ap.add_argument("--profile_plan_device", action="store_true",
                    help="RTT-free per-program plan timing: enqueue K "
                    "identical dispatches of each device program and sync "
                    "ONCE, so the per-iteration figure is device compute "
                    "(plus amortized dispatch), not a tunnel round trip "
                    "per call like --profile_plan's block_until_ready "
                    "slices")
    ap.add_argument("--data_parallel", type=int, default=0,
                    help="run the FULLY sharded pipeline over an N-device "
                    "mesh (all plan phases GSPMD + shard_map beam); on one "
                    "host use XLA_FLAGS=--xla_force_host_platform_device_"
                    "count=N --platform cpu for a virtual mesh")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (the JAX_PLATFORMS env var "
                    "is ignored when sitecustomize preloads a plugin)")
    args = ap.parse_args()

    if args.platform:
        import jax as _jax
        _jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    from vsrcic_tpu.models.api import ControllableCaptioner
    from vsrcic_tpu.models.captioner import CaptionerConfig
    from vsrcic_tpu.models.s_ssp import SSPConfig, init_ssp_params
    from vsrcic_tpu.models.sinkhorn import SinkhornConfig, init_sinkhorn_params
    from vsrcic_tpu.pipelines import EvalPipeline

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    n_jobs = args.jobs or (256 if on_tpu else 4)
    iters = args.iters or (5 if on_tpu else 1)
    D = 2048 if on_tpu else 64
    N_DET = 50

    cfg = CaptionerConfig(
        seq_len=20, vocab_size=10000 if on_tpu else 50, bos_idx=2,
        det_feat_size=D,
        input_encoding_size=1000 if on_tpu else 16,
        rnn_size=1000 if on_tpu else 16, att_size=512 if on_tpu else 8)
    key = jax.random.PRNGKey(0)
    captioner = ControllableCaptioner(
        cfg, key=key,
        verb_2_vob_all={str(i): [5 + i % 30, 40 + i % 30]
                        for i in range(1, 200)},
        use_fused_attention=bool(args.fused) and on_tpu,
        table_dtype=jnp.bfloat16 if (args.bf16_tables and on_tpu) else None,
        use_vocab_topk=bool(args.vocab_topk) and on_tpu)
    ssp_cfg = (SSPConfig(dataset="coco") if on_tpu
               else SSPConfig(hidden_size=32, embed_size=32))
    ssp_params = init_ssp_params(jax.random.PRNGKey(1), ssp_cfg)
    kcfg = SinkhornConfig(n=10, n_iters=20, tau=0.1)
    kparams = init_sinkhorn_params(jax.random.PRNGKey(2), kcfg)
    mesh = None
    if args.data_parallel:
        from vsrcic_tpu.parallel import make_mesh
        mesh = make_mesh(n_data=args.data_parallel)
    pipe = EvalPipeline(captioner, ssp_params, ssp_cfg, kparams, kcfg,
                        eos_word=3, beam_size=args.beam,
                        fast_ssp=bool(args.fast_ssp), mesh=mesh)

    jobs = make_jobs(n_jobs, D=2048)  # sinkhorn input dims are fixed (2352)
    if D != 2048:
        # CPU smoke: shrink the beam-side tensors, keep sinkhorn dims
        for j in jobs:
            j.seqs_all = j.seqs_all[:, :, :D].copy()
    rng = np.random.RandomState(3)
    dets = rng.rand(n_jobs, N_DET, D).astype(np.float32)

    # stage per-job features on device ONCE: on a real TPU host the batch
    # ingest is PCIe-fast and hidden by the prefetch loader; this container's
    # tunnel (~30 MB/s) would otherwise dominate and measure the tunnel,
    # not the pipeline (see docs/ENGINEERING_NOTES.md)
    import jax.numpy as jnp
    seqs_all_dev = pipe.stage_seqs_all(jobs)
    sink_feats = pipe.stage_job_feats(jobs)
    dets_dev = jnp.asarray(dets)

    def run_once():
        t0 = time.perf_counter()
        recons, vls = pipe.plan_batch_device(jobs, seqs_all=seqs_all_dev,
                                             sink_feats=sink_feats)
        jax.block_until_ready(recons)
        t1 = time.perf_counter()
        if mesh is not None:
            from vsrcic_tpu.parallel.sharded import sharded_beam_search_v
            res = sharded_beam_search_v(
                pipe.captioner, mesh, dets_dev, recons,
                jnp.asarray(vls).astype(jnp.int32), eos_word=3,
                beam_size=args.beam)
        else:
            res = pipe.captioner.beam_search_v(
                dets_dev, recons, vls, eos_word=3, beam_size=args.beam)
        np.asarray(res.words)
        t2 = time.perf_counter()
        return t1 - t0, t2 - t0

    run_once()  # compile
    if args.profile_plan:
        from vsrcic_tpu.pipelines.sr_groups import extract_verb_groups_arrays
        sl = {}

        def t(name, fn):
            t0 = time.perf_counter()
            for _ in range(args.iters or 3):
                r = fn()
            sl[name] = round((time.perf_counter() - t0) * 1e3
                             / (args.iters or 3), 2)
            return r

        cv = np.stack([j.control_verb for j in jobs])
        dv = np.stack([j.det_seqs_v for j in jobs])
        dsr = np.stack([j.det_seqs_sr for j in jobs])
        ga = t("extract_ms", lambda: extract_verb_groups_arrays(cv, dv, dsr))
        t("ssp_ms", lambda: np.asarray(pipe._ssp_gen(
            ga.verbs[:, None], ga.det_sr)[0]))

        # rebuild phase-C inputs exactly as plan_rank_batch does, to time
        # the sinkhorn device call / P_soft readback / Hungarian separately
        n = pipe.sinkhorn_len
        plen, pair_off = ga.pair_len, ga.pair_off
        multi = np.nonzero(plen > 1)[0]
        sink_slices = {}
        if multi.size:
            m = np.where(plen > 1, np.minimum(plen, n), plen)[multi]
            owner = ga.owners[ga.pair_group[multi]].astype(np.int32)
            within = np.arange(n)[None, :]
            valid = within < m[:, None]
            lo = pair_off[:-1][multi][:, None]
            hi = pair_off[1:][multi][:, None]
            locs_pad = np.where(
                valid, ga.slot_flat[np.minimum(lo + within, hi - 1)], 0
            ).astype(np.int32)
            P_dev = t("sinkhorn_ms", lambda: jax.block_until_ready(
                pipe._sinkhorn_gather(*sink_feats, jnp.asarray(owner),
                                      jnp.asarray(locs_pad),
                                      jnp.asarray(valid))))
            P_soft = t("psoft_readback_ms", lambda: np.asarray(P_dev))
            from vsrcic_tpu.ops.assignment import hungarian_assign
            t("hungarian_ms", lambda: hungarian_assign(
                np.transpose(P_soft, (0, 2, 1))))
            sl["n_pairs"] = int(multi.size)

        t("full_rank_ms", lambda: pipe.plan_rank_batch(
            jobs, sink_feats=sink_feats))
        rank_idx, rank_valid, _ = pipe.plan_rank_batch(
            jobs, sink_feats=sink_feats)
        t("recons_ms", lambda: jax.block_until_ready(pipe._build_recons(
            seqs_all_dev[0], jnp.asarray(rank_idx), jnp.asarray(rank_valid),
            seqs_all_dev[1])))
        print(json.dumps({"plan_breakdown": sl, "groups": len(ga.verbs)}))

    if args.profile_plan_device:
        from vsrcic_tpu.pipelines.sr_groups import extract_verb_groups_arrays
        K = max(args.iters or 8, 8)
        cv = np.stack([j.control_verb for j in jobs])
        dv = np.stack([j.det_seqs_v for j in jobs])
        dsr = np.stack([j.det_seqs_sr for j in jobs])
        ga = extract_verb_groups_arrays(cv, dv, dsr)

        def t_deep(fn):
            fn()  # warm (compile + first transfer)
            jax.block_until_ready(fn())
            t0 = time.perf_counter()
            r = None
            for _ in range(K):
                r = fn()
            jax.block_until_ready(r)
            return round((time.perf_counter() - t0) * 1e3 / K, 2)

        sld = {"k_deep": K}
        verbs_d = jnp.asarray(ga.verbs[:, None])
        dsr_d = ga.det_sr  # host: _ssp_gen reads slot count from numpy
        sld["ssp_ms"] = t_deep(lambda: pipe._ssp_gen(verbs_d, dsr_d)[0])
        n = pipe.sinkhorn_len
        plen, pair_off = ga.pair_len, ga.pair_off
        multi = np.nonzero(plen > 1)[0]
        if multi.size:
            m = np.where(plen > 1, np.minimum(plen, n), plen)[multi]
            owner = jnp.asarray(ga.owners[ga.pair_group[multi]]
                                .astype(np.int32))
            within = np.arange(n)[None, :]
            valid = within < m[:, None]
            lo = pair_off[:-1][multi][:, None]
            hi = pair_off[1:][multi][:, None]
            locs_pad = jnp.asarray(np.where(
                valid, ga.slot_flat[np.minimum(lo + within, hi - 1)], 0
            ).astype(np.int32))
            valid_d = jnp.asarray(valid)
            sld["sinkhorn_ms"] = t_deep(lambda: pipe._sinkhorn_gather(
                *sink_feats, owner, locs_pad, valid_d))
            sld["n_pairs"] = int(multi.size)
        rank_idx, rank_valid, _ = pipe.plan_rank_batch(
            jobs, sink_feats=sink_feats)
        ri, rv = jnp.asarray(rank_idx), jnp.asarray(rank_valid)
        sld["recons_ms"] = t_deep(lambda: pipe._build_recons(
            seqs_all_dev[0], ri, rv, seqs_all_dev[1]))
        # the beam on the same harness, for a same-units denominator
        vls = np.where(rank_valid, 0.0, -1.0)
        recons_d = pipe._build_recons(seqs_all_dev[0], ri, rv,
                                      seqs_all_dev[1])
        sld["beam_ms"] = t_deep(lambda: pipe.captioner.beam_search_v(
            dets_dev, recons_d, vls, eos_word=3,
            beam_size=args.beam).words)
        print(json.dumps({"plan_device_rtt_free": sld,
                          "groups": len(ga.verbs)}))

    t_plan = t_total = 0.0
    for _ in range(iters):
        dt_plan, dt_total = run_once()
        t_plan += dt_plan
        t_total += dt_total
    t_plan /= iters
    t_total /= iters

    # software-pipelined steady state (eval CLI mode): run_stream enqueues
    # batch k+1's plan BEFORE batch k's beam, so the plan readback (a full
    # tunnel RTT) rides under the in-flight beam; warm one stream first,
    # then time a longer one
    stream = [(dets_dev, jobs, seqs_all_dev, sink_feats)] * 2
    for _ in pipe.run_stream(stream):
        pass
    n_stream = max(iters, 4)
    t0 = time.perf_counter()
    for _ in pipe.run_stream([(dets_dev, jobs, seqs_all_dev,
                               sink_feats)] * n_stream):
        pass
    t_piped = (time.perf_counter() - t0) / n_stream

    print(json.dumps({
        "metric": "pipeline_captions_per_sec_per_chip",
        "value": round(n_jobs / t_piped, 2),
        "unit": "captions/s/chip",
        "jobs_per_batch": n_jobs,
        "plan_ms": round(t_plan * 1e3, 2),
        "beam_ms": round((t_total - t_plan) * 1e3, 2),
        "sequential_caps_per_s": round(n_jobs / t_total, 2),
        "beam_size": args.beam,
    }))


if __name__ == "__main__":
    from vsrcic_tpu.utils.retry import with_backend_retry

    with_backend_retry(main, attempts=5, label="bench_pipeline",
                       probe_timeout=150.0)
