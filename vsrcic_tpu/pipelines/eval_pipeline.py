"""Full eval composition: role-sort -> region-sort -> assignment rounding ->
rank merge -> feature permutation -> joint beam search.

Port of the reference eval loops (coco_scripts/eval_coco.py:116-255,
flickr_scripts/eval_flickr.py:120-262) restructured for TPU: the reference
runs every model call per-caption/per-verb at batch 1 with Python loops and a
GPU->CPU munkres round trip per ambiguous role; here each eval batch makes
exactly three batched device calls —

  1. one S-SSP constrained generate over ALL verb groups in the batch,
  2. one SinkhornNet forward over ALL ambiguous (verb, SR) pairs,
  3. one joint beam search over ALL (image, caption) pairs,

with the tiny rank-assembly/merge/permutation logic host-side in numpy
(metadata-sized; same semantics as the reference incl. verb_rank_merge and
the fill-tail-with-last-group recons layout, ref eval_coco.py:222-237).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vsrcic_tpu.models.api import ControllableCaptioner
from vsrcic_tpu.models.s_ssp import (SSPConfig, ssp_generate,
                                     ssp_generate_fast)
from vsrcic_tpu.models.sinkhorn import SinkhornConfig, sinkhorn_net_apply
from vsrcic_tpu.ops.assignment import hungarian_assign
from vsrcic_tpu.pipelines.sr_groups import (VerbGroup,
                                            extract_verb_groups_batch)
from vsrcic_tpu.utils.rank_merge import verb_rank_merge


@dataclass
class CaptionJob:
    """One (image, caption) pair's control inputs (numpy, host)."""
    seqs_vis: np.ndarray       # (L, Dv)
    seqs_txt: np.ndarray       # (L, 300)
    seqs_pos: np.ndarray       # (L, 4)
    seqs_all: np.ndarray       # (L, M, D)
    control_verb: np.ndarray   # (8,)
    det_seqs_v: np.ndarray     # (L, 8)
    det_seqs_sr: np.ndarray    # (L, 8)
    verb_list: np.ndarray      # (L, 1)


@dataclass
class _PlanPending:
    """In-flight plan phase: device handles (planner preds + Sinkhorn
    soft-perms, both enqueued, NOT read back) plus the host-side CSR
    bookkeeping plan_finish needs to assemble ranks."""
    n_jobs: int
    L: int
    jobs: Sequence["CaptionJob"]
    ga: object                       # verb-group arrays (None: no groups)
    preds_dev: object = None
    P_soft_dev: object = None        # None when no ambiguous pairs
    multi: np.ndarray = None
    rank_len: np.ndarray = None
    rank_off: np.ndarray = None
    rank_flat: np.ndarray = None
    locs_pad: np.ndarray = None
    valid: np.ndarray = None
    within: np.ndarray = None


class EvalPipeline:
    def __init__(self, captioner: ControllableCaptioner, ssp_params,
                 ssp_cfg: SSPConfig, sinkhorn_params,
                 sinkhorn_cfg: SinkhornConfig, eos_word: int,
                 fixed_len: int = 10, sinkhorn_len: int = 10,
                 beam_size: int = 5, gt: bool = False,
                 fast_ssp: bool = True, mesh=None):
        # mesh: a jax.sharding.Mesh with a "data" axis — EVERY device phase
        # of the pipeline then runs sharded over it: the beam via shard_map
        # (each shard executes the single-chip fast path incl. Pallas
        # kernels, parallel/sharded.py), and the plan phase's three device
        # calls (constrained planner generate over the group axis, Sinkhorn
        # over the ambiguous-pair axis, recons build over the job axis) via
        # GSPMD-sharded jit — all batch-parallel, so GSPMD partitions them
        # with no collectives and per-chip work is 1/N of each axis.
        # Each call pads its leading axis to a data-axis multiple (padding
        # rows are inert: zero verbs/SRs plan to nothing, zero features
        # normalize to uniform and are discarded) and slices back.
        self.mesh = mesh
        self.captioner = captioner
        self.ssp_params = ssp_params
        self.ssp_cfg = ssp_cfg
        self.sinkhorn_params = sinkhorn_params
        self.sinkhorn_cfg = sinkhorn_cfg
        self.eos_word = eos_word
        self.fixed_len = fixed_len
        self.sinkhorn_len = sinkhorn_len
        self.beam_size = beam_size
        self.gt = gt

        # fast_ssp: KV-cached incremental planner decode — token-exact vs
        # the full-buffer path (tests/test_ssp_fast.py; only tokens are
        # consumed here), ~max_len× less decoder compute per step
        gen = ssp_generate_fast if fast_ssp else ssp_generate
        self._ssp_progs = {}
        if mesh is None:
            self._ssp_make = lambda n_steps: jax.jit(
                lambda v, d: gen(ssp_params, ssp_cfg, v, d,
                                 mode="not-normal", n_steps=n_steps))
        else:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as _P
            data = NamedSharding(mesh, _P("data"))
            rep = NamedSharding(mesh, _P())
            self._mesh_n = mesh.shape["data"]
            ssp_params_r = jax.device_put(ssp_params, rep)
            sink_params_r = jax.device_put(sinkhorn_params, rep)

            def _make(n_steps):
                jgen = jax.jit(
                    lambda p, v, d: gen(p, ssp_cfg, v, d, mode="not-normal",
                                        n_steps=n_steps),
                    in_shardings=(rep, data, data),
                    out_shardings=data)
                return self._pad_sharded(
                    lambda v, d: jgen(ssp_params_r, v, d))
            self._ssp_make = _make

        # emit recons directly in the beam's statics-table layout (bf16
        # cast + M padded to the fused kernel's 8-row tiling) so the beam
        # program skips its in-trace pad+convert+copy over the full
        # (P, L, M, D) tensor — identical values (the beam would apply the
        # same cast/pad; padded rows are zero => masked)
        self._recons_dtype = getattr(captioner, "table_dtype", None)
        self._recons_m_pad = None
        if getattr(captioner, "use_fused_attention", False):
            from vsrcic_tpu.ops.fused_attention import fused_m_pad
            self._recons_m_pad = fused_m_pad
        def build_recons(seqs_all, rank_idx, rank_valid, row_sums):
            out = self._build_recons_impl(seqs_all, rank_idx, rank_valid,
                                          row_sums)
            if self._recons_dtype is not None:
                out = out.astype(self._recons_dtype)
            if self._recons_m_pad is not None:
                m = out.shape[2]
                m_pad = self._recons_m_pad(m)
                if m_pad != m:
                    out = jnp.pad(out, [(0, 0), (0, 0), (0, m_pad - m),
                                        (0, 0)])
            return out

        def sinkhorn_gather(sink_params, vis, txt, pos, owner, locs, valid):
            """Assemble sinkhorn inputs ON DEVICE: row j of sink input s is
            concat(vis,txt,pos)[owner[s], locs[s, j]] for valid j, else 0 —
            exactly the reference's per-SR copy loop (eval_coco.py:178-183)
            without the host materialization + duplicated transfer."""
            feats = jnp.concatenate([vis, txt, pos], -1)   # (P, L, F)
            rows = feats[owner[:, None], locs]             # (S, n, F)
            return sinkhorn_net_apply(
                sink_params, sinkhorn_cfg,
                jnp.where(valid[:, :, None], rows, 0.0))

        if mesh is None:
            self._build_recons = jax.jit(build_recons)
            jsink = jax.jit(sinkhorn_gather)
            self._sinkhorn_gather = (
                lambda vis, txt, pos, owner, locs, valid:
                jsink(sinkhorn_params, vis, txt, pos, owner, locs, valid))
        else:
            self._build_recons = self._pad_sharded(jax.jit(
                build_recons,
                in_shardings=(data, data, data, data), out_shardings=data))
            # the sink-row gather reads arbitrary jobs' features, so the
            # (P, L, F) feature tables are REPLICATED and only the pair
            # axis (owner/locs/valid and the (S, n, n) output) is sharded —
            # the gather stays shard-local, no collectives
            jsink = jax.jit(
                sinkhorn_gather,
                in_shardings=(rep, rep, rep, rep, data, data, data),
                out_shardings=data)
            self._sinkhorn_gather = self._pad_sharded(
                lambda vis, txt, pos, owner, locs, valid:
                jsink(sink_params_r, vis, txt, pos, owner, locs, valid),
                static_args=3)

    # ------------------------------------------------------------------
    def _ssp_gen(self, verbs, det_sr):
        """Constrained planner generate with the scan truncated to the
        batch's max slot count (bucketed to even lengths so at most
        max_len/2 programs ever compile). Each constrained step emits one
        unused input slot, so steps past the max slot count write the init
        values — truncation is output-IDENTICAL (s_ssp._generate_loop
        docstring; pinned in tests/test_ssp_fast.py). The slot count is
        read on host when det_sr is a numpy array (always, from
        plan_rank_batch — ga.det_sr is host metadata); a device array
        falls back to the full-length program rather than forcing a sync.
        """
        n_steps = self.ssp_cfg.max_len
        if isinstance(det_sr, np.ndarray) and det_sr.size:
            m = int((det_sr != 0).sum(axis=1).max())
            n_steps = min(n_steps, max(2, m + (m % 2)))
        prog = self._ssp_progs.get(n_steps)
        if prog is None:
            prog = self._ssp_progs[n_steps] = self._ssp_make(n_steps)
        return prog(jnp.asarray(verbs), jnp.asarray(det_sr))

    def _pad_sharded(self, fn, static_args: int = 0):
        """Wrap a sharded-jit fn: pad the batched args' leading axis up to a
        data-axis multiple (zero rows are inert in every wrapped fn) and
        slice the outputs back. The first `static_args` args are replicated
        operands and pass through unpadded."""
        n = self._mesh_n

        def wrapped(*args):
            stat = args[:static_args]
            rest = [jnp.asarray(a) for a in args[static_args:]]
            b = rest[0].shape[0]
            pad = (-b) % n
            if pad:
                rest = [jnp.concatenate(
                    [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], 0)
                    for a in rest]
            out = fn(*stat, *rest)
            if pad:
                out = jax.tree_util.tree_map(lambda o: o[:b], out)
            return out
        return wrapped

    def stage_job_feats(self, jobs: Sequence[CaptionJob]):
        """Device-stage the per-job (vis, txt, pos) tensors the Sinkhorn
        inputs are gathered from (replicated across the mesh when sharded —
        the pair-axis gather reads arbitrary jobs). Callers iterating over
        the same jobs can stage once and pass the result to plan/run
        (`sink_feats=`)."""
        feats = (jnp.asarray(np.stack([j.seqs_vis for j in jobs])),
                 jnp.asarray(np.stack([j.seqs_txt for j in jobs])),
                 jnp.asarray(np.stack([j.seqs_pos for j in jobs])))
        if self.mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as _P
            feats = jax.device_put(
                feats, NamedSharding(self.mesh, _P()))
        return feats

    def plan_dispatch(self, jobs: Sequence[CaptionJob], sink_feats=None):
        """Enqueue the plan phase's device programs (batched Sinkhorn +
        constrained planner) WITHOUT any host sync, returning a pending
        handle for plan_finish. Splitting dispatch from finish lets a
        batch runner enqueue batch k+1's plan BEFORE batch k's beam, so
        the plan readback rides under the in-flight beam instead of
        queueing behind it (see run_stream)."""
        from vsrcic_tpu.pipelines.sr_groups import extract_verb_groups_arrays

        L = self.fixed_len
        n_jobs = len(jobs)

        ga = extract_verb_groups_arrays(
            np.stack([j.control_verb for j in jobs]),
            np.stack([j.det_seqs_v for j in jobs]),
            np.stack([j.det_seqs_sr for j in jobs]))
        if ga is None:
            return _PlanPending(n_jobs=n_jobs, L=L, jobs=jobs, ga=None)

        # -- phases B+C dispatched together, Sinkhorn FIRST ---------------
        # the two device calls are independent (the planner orders roles,
        # Sinkhorn orders regions within a role), so both are enqueued
        # before either is read back: the device runs Sinkhorn then the
        # planner while the host's Hungarian rounding + rank scatter
        # overlap the planner's execution. rank CSR: per (group, sr) pair
        # the slots in final within-role order — occurrence order for
        # singletons, Hungarian order for ambiguous pairs (truncated to
        # sinkhorn_len, ref eval_coco.py:183-200)
        n = self.sinkhorn_len
        plen = ga.pair_len
        pair_off = ga.pair_off
        multi = np.nonzero(plen > 1)[0]
        rank_len = np.where(plen > 1, np.minimum(plen, n), plen)
        rank_off = np.concatenate([[0], np.cumsum(rank_len)])
        q_rep = np.repeat(np.arange(len(plen)), rank_len)
        within_r = np.arange(rank_off[-1]) - np.repeat(rank_off[:-1], rank_len)
        rank_flat = ga.slot_flat[pair_off[:-1][q_rep] + within_r]

        P_soft_dev = locs_pad = valid = within = None
        if multi.size:
            m = rank_len[multi]                                    # (S,)
            owner = ga.owners[ga.pair_group[multi]].astype(np.int32)
            within = np.arange(n)[None, :]                         # (1, n)
            valid = within < m[:, None]                            # (S, n)
            lo = pair_off[:-1][multi][:, None]
            hi = pair_off[1:][multi][:, None]
            locs_pad = np.where(
                valid, ga.slot_flat[np.minimum(lo + within, hi - 1)], 0
            ).astype(np.int32)
            if sink_feats is None:
                sink_feats = self.stage_job_feats(jobs)
            P_soft_dev = self._sinkhorn_gather(
                *sink_feats, jnp.asarray(owner), jnp.asarray(locs_pad),
                jnp.asarray(valid))

        preds_dev, _ = self._ssp_gen(ga.verbs[:, None], ga.det_sr)
        return _PlanPending(
            n_jobs=n_jobs, L=L, jobs=jobs, ga=ga, preds_dev=preds_dev,
            P_soft_dev=P_soft_dev, multi=multi, rank_len=rank_len,
            rank_off=rank_off, rank_flat=rank_flat, locs_pad=locs_pad,
            valid=valid, within=within)

    def plan_finish(self, pend: "_PlanPending"
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Read back a plan_dispatch handle (ONE combined device_get — on a
        tunneled device every extra sync is a full RTT) and run the host
        phases: Hungarian rounding + vectorized rank assembly + merge."""
        L, n_jobs, ga = pend.L, pend.n_jobs, pend.ga
        rank_idx = np.zeros((n_jobs, L), np.int32)
        rank_valid = np.zeros((n_jobs, L), bool)
        if ga is None:
            return rank_idx, rank_valid, np.full((n_jobs, L), -1.0)
        G = len(ga.owners)
        n = self.sinkhorn_len
        multi, rank_len, rank_off, rank_flat = (
            pend.multi, pend.rank_len, pend.rank_off, pend.rank_flat)
        locs_pad, valid, within = pend.locs_pad, pend.valid, pend.within

        P_soft, preds = jax.device_get((pend.P_soft_dev, pend.preds_dev))
        if P_soft is not None:
            # profit = P^T as in the reference (eval_coco.py:185); row
            # assignments are a permutation so the valid entries are
            # distinct, and invalid slots are pushed past them with n+col
            assign = hungarian_assign(np.transpose(P_soft, (0, 2, 1)))
            ordv = np.argsort(np.where(valid, assign, n + within), axis=1)
            new_locs = np.take_along_axis(locs_pad, ordv, 1)       # (S, n)
            flat_idx = (rank_off[:-1][multi][:, None] + within)[valid]
            rank_flat[flat_idx] = new_locs[valid]
        jobs = pend.jobs

        # -- phase D: vectorized rank assembly + per-job merge -------------
        # per (group, pred position): which pair it selects (row-major order
        # = the loop's group-then-pred walk, ref eval_coco.py:202-211)
        pk = ga.pair_key
        pvalid = np.cumprod(preds != 0, axis=1).astype(bool)   # break at 0
        # guard both ends: a negative planner token would otherwise compute
        # g*sr_space + pred and alias into the PREVIOUS group's pair key
        # (the loop oracle skips unknown SRs; unreachable with the argmax
        # planner, but make the invariant explicit)
        safe = (preds > 0) & (preds < ga.sr_space)             # no key alias
        keys = np.where(safe,
                        np.arange(G)[:, None] * ga.sr_space + preds, -1)
        pos_q = np.searchsorted(pk, keys)
        found = np.where(pos_q < len(pk),
                         pk[np.minimum(pos_q, len(pk) - 1)] == keys, False)
        use = pvalid & safe & found
        gi_sel, _ = np.nonzero(use)
        sel_q = pos_q[use]
        counts = rank_len[sel_q]
        sel_off = np.concatenate([[0], np.cumsum(counts)])
        rep = np.repeat(np.arange(len(sel_q)), counts)
        within_s = np.arange(sel_off[-1]) - np.repeat(sel_off[:-1], counts)
        grank_flat = rank_flat[rank_off[:-1][sel_q][rep] + within_s]
        g_counts = np.bincount(gi_sel, weights=counts.astype(float),
                               minlength=G).astype(np.int64)
        g_off = np.concatenate([[0], np.cumsum(g_counts)])

        # jobs' groups are contiguous (owners nondecreasing by construction)
        job_g_off = np.searchsorted(ga.owners, np.arange(n_jobs + 1))
        ng = np.diff(job_g_off)

        # single-verb jobs (the common case): final rank IS the group rank —
        # vectorized scatter into the (P, L) plane
        single = np.nonzero(ng == 1)[0]
        if single.size:
            gsel = job_g_off[:-1][single]
            lens = np.minimum(g_counts[gsel], L)
            p_rep = np.repeat(single, lens)
            off = np.concatenate([[0], np.cumsum(lens)])
            w = np.arange(off[-1]) - np.repeat(off[:-1], lens)
            rank_idx[p_rep, w] = grank_flat[np.repeat(g_off[gsel], lens) + w]
            rank_valid[p_rep, w] = True

        # multi-verb jobs: sequential order-preserving merges (tiny lists)
        for p in np.nonzero(ng > 1)[0]:
            glo, ghi = job_g_off[p], job_g_off[p + 1]
            final = grank_flat[g_off[glo]:g_off[glo + 1]].tolist()
            for g in range(glo + 1, ghi):
                final = verb_rank_merge(
                    final, grank_flat[g_off[g]:g_off[g + 1]].tolist())
            k = min(len(final), L)
            rank_idx[p, :k] = final[:k]
            rank_valid[p, :k] = True

        # verb_list permuted on host (metadata-sized; exact perm math)
        job_vl = np.stack([np.asarray(j.verb_list).squeeze(-1) for j in jobs])
        verb_lists = np.where(
            rank_valid, np.take_along_axis(job_vl, rank_idx, 1), -1.0)
        return rank_idx, rank_valid, verb_lists

    def plan_rank_batch(self, jobs: Sequence[CaptionJob], sink_feats=None
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """All jobs -> (rank_idx (P, L) int32, rank_valid (P, L) bool,
        verb_lists (P, L)) — the metadata-sized plan; features are permuted
        on device from these indices (see plan_batch/_build_recons_impl).

        Composition per job mirrors eval_coco.py:127-219 with the planner
        and Sinkhorn batched across jobs and every host phase numpy-
        vectorized (CSR over groups/pairs/slots); the only remaining Python
        loop is `verb_rank_merge` over multi-verb jobs (inherently
        sequential, <=8 tiny lists each). Oracle-equivalent to
        `plan_rank_batch_loop` (tests/test_plan_vectorized.py).
        Implemented as plan_dispatch + plan_finish (one host sync)."""
        return self.plan_finish(self.plan_dispatch(jobs, sink_feats))

    def plan_rank_batch_loop(self, jobs: Sequence[CaptionJob], sink_feats=None
                             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Reference (loop) implementation of plan_rank_batch — the oracle
        the vectorized path is pinned against; kept because it reads as a
        direct transcription of eval_coco.py:127-219.
        """
        # -- phase A: extract verb groups (host, numpy-vectorized over the
        # batch; loop-oracle-exact, tests/test_sr_groups_batch.py) ---------
        all_groups, group_owner = extract_verb_groups_batch(
            np.stack([j.control_verb for j in jobs]),
            np.stack([j.det_seqs_v for j in jobs]),
            np.stack([j.det_seqs_sr for j in jobs]))

        # -- phase B: one batched constrained planner call ---------------
        if all_groups:
            verbs = np.asarray([[g.verb] for g in all_groups])
            det_sr = np.stack([g.det_sr_seq for g in all_groups])
            preds, _ = self._ssp_gen(verbs, det_sr)
            preds = np.asarray(preds)
        else:
            preds = np.zeros((0, self.ssp_cfg.max_len), np.int32)

        # -- phase C: device-gathered batched Sinkhorn + host assignment ---
        sink_jobs: List[Tuple[int, int, List[int]]] = []  # (group_i, sr, locs)
        for gi, g in enumerate(all_groups):
            for sr in g.need_re_rank:
                sink_jobs.append((gi, sr, g.sr_find[sr]))

        sr_rank: Dict[Tuple[int, int], List[int]] = {}
        if sink_jobs:
            n = self.sinkhorn_len
            S = len(sink_jobs)
            owner = np.asarray([group_owner[gi] for gi, _, _ in sink_jobs],
                               np.int32)
            locs_pad = np.zeros((S, n), np.int32)
            valid = np.zeros((S, n), bool)
            for s, (_, _, locs) in enumerate(sink_jobs):
                m = min(len(locs), n)
                locs_pad[s, :m] = locs[:m]
                valid[s, :m] = True
            if sink_feats is None:
                sink_feats = self.stage_job_feats(jobs)
            P_soft = np.asarray(self._sinkhorn_gather(
                *sink_feats, jnp.asarray(owner), jnp.asarray(locs_pad),
                jnp.asarray(valid)))
            # profit = P^T as in the reference (eval_coco.py:185)
            assign = hungarian_assign(np.transpose(P_soft, (0, 2, 1)))
            for (gi, sr, locs), ass in zip(sink_jobs, assign):
                sr_re = np.asarray(ass[:len(locs)])
                order = np.argsort(sr_re)
                sr_rank[(gi, sr)] = [locs[int(o)] for o in order]

        # -- phase D: rank assembly + merge (host, metadata-sized) ---------
        L = self.fixed_len
        n_jobs = len(jobs)
        rank_idx = np.zeros((n_jobs, L), np.int32)
        rank_valid = np.zeros((n_jobs, L), bool)
        verb_lists = np.full((n_jobs, L), -1.0)

        per_job_ranks: List[List[List[float]]] = [[] for _ in range(n_jobs)]
        for gi, g in enumerate(all_groups):
            verb_rank: List[float] = []
            for sr_ in preds[gi]:
                sr_ = int(sr_)
                if sr_ == 0:
                    break
                if sr_ not in g.sr_find:
                    continue
                if len(g.sr_find[sr_]) != 1:
                    verb_rank += list(sr_rank[(gi, sr_)])
                else:
                    verb_rank += g.sr_find[sr_]
            per_job_ranks[group_owner[gi]].append(verb_rank)

        for p, job in enumerate(jobs):
            ranks = per_job_ranks[p]
            if not ranks:
                final_rank: List[float] = []
            else:
                final_rank = ranks[0]
                for extra in ranks[1:]:
                    final_rank = verb_rank_merge(final_rank, extra)
            for j, rk in enumerate(final_rank):
                if j < L:
                    rank_idx[p, j] = int(rk)
                    rank_valid[p, j] = True
            # verb_list permuted on host (metadata-sized; exact perm math)
            vl = np.full((L,), -1.0)
            vl[rank_valid[p]] = np.asarray(job.verb_list).squeeze(-1)[
                rank_idx[p][rank_valid[p]]]
            verb_lists[p] = vl
        return rank_idx, rank_valid, verb_lists

    def stage_seqs_all(self, jobs: Sequence[CaptionJob]):
        """Device-stage the (P, L, M, D) group-feature tensor for the recons
        build: f32 row sums are taken FIRST (exact liveness), then the
        tensor is stored in the recons dtype (bf16 on the fast path —
        halves the recons gather's HBM traffic; gather and cast commute so
        values are identical). Returns (seqs_all_dev, row_sums_dev)."""
        arr = jnp.asarray(np.stack([j.seqs_all for j in jobs]))
        row_sums = jnp.sum(arr, (2, 3))
        if self._recons_dtype is not None:
            arr = arr.astype(self._recons_dtype)
        # no explicit sharding here: the job axis may not divide the mesh —
        # the padded sharded jit (_pad_sharded) places its padded inputs
        return arr, row_sums

    @staticmethod
    def _as_staged(seqs_all):
        """Accept stage_seqs_all's (arr, row_sums) or a raw device array."""
        if isinstance(seqs_all, tuple):
            return seqs_all
        return seqs_all, jnp.sum(seqs_all, (2, 3)).astype(jnp.float32)

    def plan_batch(self, jobs: Sequence[CaptionJob]
                   ) -> Tuple[np.ndarray, np.ndarray]:
        """All jobs -> (recons (P, L, M, D), verb_lists (P, L)).

        Composition per job mirrors eval_coco.py:127-237 but with the planner
        and Sinkhorn batched across jobs and the feature permutation built on
        DEVICE from the (rank, valid) indices: each perm-matrix row has one 1,
        so the gather equals the reference's `perm_matrix @ flat` exactly
        (ref eval_coco.py:222-231), without materializing (P, L, M, D) on the
        host or re-shipping it per batch.
        """
        rank_idx, rank_valid, verb_lists = self.plan_rank_batch(jobs)
        arr, row_sums = self.stage_seqs_all(jobs)
        recons = self._build_recons(arr, jnp.asarray(rank_idx),
                                    jnp.asarray(rank_valid), row_sums)
        return np.asarray(recons), verb_lists

    def plan_batch_device(self, jobs, seqs_all=None, sink_feats=None):
        """plan_rank_batch + device recons, keeping everything on device.
        seqs_all: pre-staged stage_seqs_all output (or a raw (P, L, M, D)
        device array; staged here if None). Returns (recons device array,
        verb_lists host array)."""
        rank_idx, rank_valid, verb_lists = self.plan_rank_batch(
            jobs, sink_feats=sink_feats)
        if seqs_all is None:
            seqs_all = self.stage_seqs_all(jobs)
        arr, row_sums = self._as_staged(seqs_all)
        recons = self._build_recons(arr, jnp.asarray(rank_idx),
                                    jnp.asarray(rank_valid), row_sums)
        return recons, verb_lists

    @staticmethod
    def _build_recons_impl(seqs_all, rank_idx, rank_valid, row_sums=None):
        """Device recons: gather rows by rank, drop all-zero rows compacting
        to the front (stable), fill the tail with the last non-zero row —
        semantics of ref eval_coco.py:229-237.

        All index bookkeeping happens on the tiny (P, L) plane (row liveness
        from per-row feature sums, stable compaction, tail fill, then a
        single composed index), so the big (P, L, M, D) tensor is touched by
        exactly ONE gather — the naive form (gather, zero, re-gather twice)
        moves it through HBM three times. `row_sums` (P, L) may be
        precomputed in f32 at staging time (stage_seqs_all), which lets the
        big tensor be STORED bf16 (gather and cast commute; liveness stays
        exact f32)."""
        P, L = rank_idx.shape
        if row_sums is None:
            row_sums = jnp.sum(seqs_all, (2, 3))                  # (P, L)
        g_sums = jnp.take_along_axis(row_sums, rank_idx, 1)
        nz = jnp.where(rank_valid, g_sums != 0, False)            # live rows
        order = jnp.argsort(jnp.logical_not(nz), axis=1,
                            stable=True)                          # nz first
        n = jnp.sum(nz, axis=1)                                   # (P,)
        last = jnp.clip(n - 1, 0, L - 1)
        rows = jnp.arange(L)[None, :]
        src = jnp.where(rows < n[:, None], rows, last[:, None])   # tail fill
        comp = jnp.take_along_axis(order, src, 1)
        idx = jnp.take_along_axis(rank_idx, comp, 1)
        valid_c = jnp.take_along_axis(nz, comp, 1)
        out = jnp.take_along_axis(seqs_all, idx[:, :, None, None], 1)
        return jnp.where(valid_c[:, :, None, None], out, 0.0)

    # ------------------------------------------------------------------
    def _dispatch_beam(self, detections_per_job, recons, verb_lists,
                       n_jobs: int):
        """Enqueue the joint beam search (single-chip or shard_map-sharded);
        returns the still-computing (P, T) best-beam device array."""
        if self.mesh is not None:
            from vsrcic_tpu.parallel.sharded import sharded_beam_search_v
            n = self.mesh.shape["data"]
            pad = (-n_jobs) % n
            if pad:
                def z(a, fill=0):
                    a = jnp.asarray(a)
                    return jnp.concatenate(
                        [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], 0)
                detections_per_job = z(detections_per_job)
                recons = z(recons)
                verb_lists = z(np.asarray(verb_lists), fill=-1)
            res = sharded_beam_search_v(
                self.captioner, self.mesh, detections_per_job, recons,
                verb_lists, eos_word=self.eos_word,
                beam_size=self.beam_size, gt=self.gt)
            return res.words[:n_jobs, 0]
        res = self.captioner.beam_search_v(
            detections_per_job, recons, verb_lists, eos_word=self.eos_word,
            beam_size=self.beam_size, gt=self.gt)
        return res.words[:, 0]

    def submit_batch(self, detections_per_job: np.ndarray,
                     jobs: Sequence[CaptionJob], seqs_all=None,
                     sink_feats=None):
        """Plan + dispatch the beam WITHOUT materializing the result: the
        returned (P, T) device array is still computing, so the caller can
        overlap the next batch's plan phase (host loops + planner/Sinkhorn
        round trips) with this batch's beam — a software pipeline the
        reference's strictly sequential per-caption loop cannot express.

        NOTE: for multi-batch streams prefer run_stream — submit_batch
        enqueues batch k+1's plan AFTER batch k's beam, so the plan
        readback waits out the whole beam on the device queue."""
        recons, verb_lists = self.plan_batch_device(
            jobs, seqs_all=seqs_all, sink_feats=sink_feats)
        return self._dispatch_beam(detections_per_job, recons, verb_lists,
                                   len(jobs))

    def run_stream(self, batches):
        """Software-pipelined eval over a stream of batches; yields the
        best-beam words (P, T) numpy array per batch, in order.

        `batches` is an iterable of (detections_per_job, jobs) or
        (detections_per_job, jobs, staged_seqs_all, staged_sink_feats)
        tuples (staged entries may be None; they are staged here).

        Schedule (1 batch ahead): batch k+1's planner/Sinkhorn programs
        are enqueued BEFORE batch k's beam, so on the serialized device
        queue they run first and their (single) readback completes while
        the beam is still in flight; the Hungarian rounding + rank
        assembly for k+1 then overlap the rest of beam k. On a tunneled
        device every host sync is a full RTT (~26-43 ms measured), so the
        steady state costs exactly 2 RTTs/batch (plan readback + words
        readback) instead of the reference loop's per-caption round trips
        (ref eval_coco.py:116-255).
        """
        it = iter(batches)

        def norm(b):
            dets, jobs = b[0], b[1]
            seqs_all = b[2] if len(b) > 2 else None
            sink_feats = b[3] if len(b) > 3 else None
            if sink_feats is None:
                sink_feats = self.stage_job_feats(jobs)
            if seqs_all is None:
                seqs_all = self.stage_seqs_all(jobs)
            return dets, jobs, self._as_staged(seqs_all), sink_feats

        try:
            cur = norm(next(it))
        except StopIteration:
            return
        pend_plan = self.plan_dispatch(cur[1], sink_feats=cur[3])
        pend_words = None
        while cur is not None:
            dets, jobs, (arr, row_sums), _ = cur
            rank_idx, rank_valid, verb_lists = self.plan_finish(pend_plan)
            recons = self._build_recons(arr, jnp.asarray(rank_idx),
                                        jnp.asarray(rank_valid), row_sums)
            # stage + dispatch NEXT batch's plan before this batch's beam
            try:
                nxt = norm(next(it))
            except StopIteration:
                nxt = None
            if nxt is not None:
                pend_plan = self.plan_dispatch(nxt[1], sink_feats=nxt[3])
            words = self._dispatch_beam(dets, recons, verb_lists, len(jobs))
            if pend_words is not None:
                yield np.asarray(pend_words)
            pend_words = words
            cur = nxt
        yield np.asarray(pend_words)

    def run_batch(self, detections_per_job: np.ndarray,
                  jobs: Sequence[CaptionJob], seqs_all=None,
                  sink_feats=None) -> np.ndarray:
        """detections_per_job: (P, N, D) raw detections (image's detections
        repeated per caption). Returns best-beam words (P, T)."""
        return np.asarray(self.submit_batch(
            detections_per_job, jobs, seqs_all=seqs_all,
            sink_feats=sink_feats))
