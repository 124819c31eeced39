"""Fused vocab head: out_fc matmul + streaming per-row top-k + logsumexp.

Motivation (profiled, docs/ENGINEERING_NOTES.md): the beam decode step's
largest cost slice (~52 ms of 137 ms per 256-caption batch, vocab ablation)
is the out_fc -> log_softmax -> substitute -> broadcast-add -> top_k chain
over (rows, V) tensors. The joint (word x gate) beam top-k only ever needs,
per decode row, the top-k word logits and the row's logsumexp (see
decode/beam.beam_search_joint_candidates for the exactness argument), so the
full (rows, V) logits never need to leave the chip:

this kernel streams out_fc weight tiles HBM->VMEM once, computes each logits
tile on the MXU, folds it into running (top-k values, vocab ids) and a
running (max, sumexp) pair in VMEM, and emits only (rows, k) + (rows, 1).

Tie semantics match `jax.lax.top_k`: descending values, lowest vocab id
wins ties (the merge extracts maxima with an explicit min-id tie-break).

Replaces: the reference decodes its vocab head densely every beam step
(reference models/CaptioningModel.py:238-255 sorts the full
(batch, beam*vocab*2) tensor on GPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def vocab_topk_lse_xla(h2, w_t, bias, k):
    """Reference implementation (materializes logits; exact fp32 math).

    h2: (rows, R); w_t: (R, V); bias: (V,) ->
    (vals (rows, k) f32, ids (rows, k) i32, lse (rows, 1) f32)
    """
    logits = (jnp.dot(h2, w_t) + bias).astype(jnp.float32)
    vals, ids = jax.lax.top_k(logits, k)
    lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
    return vals, ids.astype(jnp.int32), lse


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def make_vocab_topk_lse(rows: int, r: int, v: int, k: int,
                        tile_v: int = 1024, tile_rows: int = 1280,
                        interpret: bool = False,
                        table_dtype=jnp.float32,
                        two_stage: bool = False,
                        lhs_dtype=jnp.float32):
    """Build the streaming kernel for static shapes.

    Returns fn(h2 (rows, R), w_t (R, V), bias (V,)) ->
    (vals (rows, k), ids (rows, k), lse (rows, 1)); fn pads R/V internally
    (pad once at statics construction to avoid the per-step copy: see
    fn.prepare_tables). Rows are processed in blocks of `tile_rows`
    (bounds the VMEM working set; weight tiles are re-streamed per row
    block).

    two_stage=True swaps the per-tile merge strategy: instead of k
    extract-max passes over [tile ; running-top-k] (cross-lane reductions
    every tile), the kernel maintains a per-LANE-POSITION sorted top-k
    (scratch (rows, k*128)) updated by unrolled compare-exchange inserts
    per 128-lane chunk — pure elementwise VPU ops — and runs the k
    cross-lane extraction passes only once, on the last tile, over the
    k*128 surviving candidates. Exact: a candidate excluded from its lane
    position's top-k is dominated there by >=k candidates under the
    (value desc, id asc) order, so it cannot be in the global top-k under
    the same order. Within a lane, ids arrive strictly increasing
    (tile-major, chunk-minor), so a strict `>` compare implements the
    lowest-id-wins tie rule without materializing id comparisons.
    """
    from jax.experimental import pallas as pl

    r_pad = _round_up(r, 128)
    tile_v = min(tile_v, _round_up(v, 128))
    v_pad = _round_up(v, tile_v)
    n_tiles = v_pad // tile_v
    if rows % tile_rows:
        tile_rows = next(t for t in range(min(tile_rows, rows), 0, -1)
                         if rows % t == 0)
    n_row_blocks = rows // tile_rows
    rows_blk = tile_rows
    k_pad = _round_up(k, 128)  # output lane dim
    NEG = -1e30  # python scalar (a jnp constant would be a captured tracer)
    if two_stage and tile_v % 128:
        raise ValueError("two_stage requires tile_v % 128 == 0, got %d"
                         % tile_v)
    n_chunks = tile_v // 128 if two_stage else 0

    def _extract_topk(cand_vals, cand_ids):
        """k extract-max passes, lowest-vocab-id tie-break (lax.top_k)."""
        new_vals = []
        new_ids = []
        for _ in range(k):
            mx = jnp.max(cand_vals, axis=-1, keepdims=True)      # (rows, 1)
            sel = jnp.min(jnp.where(cand_vals >= mx, cand_ids,
                                    v_pad + v), axis=-1,
                          keepdims=True)                          # (rows, 1)
            new_vals.append(mx)
            new_ids.append(sel)
            cand_vals = jnp.where(cand_ids == sel, NEG, cand_vals)
        return new_vals, new_ids

    def _fill_out(new_vals, new_ids):
        # full-lane writes (k..k_pad filled with sentinels)
        fill = k_pad - k
        vals = jnp.concatenate(
            new_vals + [jnp.full((rows_blk, fill), NEG, jnp.float32)], axis=1)
        ids = jnp.concatenate(
            new_ids + [jnp.full((rows_blk, fill), v, jnp.int32)], axis=1)
        return vals, ids

    def kernel(h2_ref, w_ref, b_ref, vals_ref, ids_ref, lse_ref,
               run_vals, run_ids, run_m, run_s):
        i = pl.program_id(1)  # vocab tile (minor grid dim)

        @pl.when(i == 0)
        def _():
            run_vals[:] = jnp.full_like(run_vals, NEG)
            run_ids[:] = jnp.full_like(run_ids, v)
            run_m[:] = jnp.full_like(run_m, NEG)
            run_s[:] = jnp.zeros_like(run_s)

        # NB: do NOT cast h2 to bf16 IN-KERNEL — the extra (rows_blk,
        # r_pad) temp pushes the scoped VMEM over 16 MB at rows>=10240
        # (batch 2048 fails to compile). lhs_dtype=bf16 instead casts the
        # OPERAND outside the kernel (the h2 block arrives bf16), giving
        # the single-pass MXU dot with no in-kernel temp.
        logits = jnp.dot(h2_ref[:], w_ref[:],
                         preferred_element_type=jnp.float32) + b_ref[0, :]

        # running logsumexp
        tile_max = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(run_m[:], tile_max)
        run_s[:] = (run_s[:] * jnp.exp(run_m[:] - m_new)
                    + jnp.sum(jnp.exp(logits - m_new), axis=-1,
                              keepdims=True))
        run_m[:] = m_new

        # streaming top-k merge: k extract-max passes over
        # [tile logits ; previous top-k], lowest-vocab-id tie-break
        tile_ids = (jax.lax.broadcasted_iota(jnp.int32,
                                             (rows_blk, tile_v), 1)
                    + i * tile_v)
        cand_vals = jnp.concatenate([logits, run_vals[:]], axis=1)
        cand_ids = jnp.concatenate([tile_ids, run_ids[:]], axis=1)
        new_vals, new_ids = _extract_topk(cand_vals, cand_ids)
        run_vals[:], run_ids[:] = _fill_out(new_vals, new_ids)

        @pl.when(i == n_tiles - 1)
        def _():
            vals_ref[:] = run_vals[:]
            ids_ref[:] = run_ids[:]
            lse_ref[:] = run_m[:] + jnp.log(run_s[:])

    def kernel2(h2_ref, w_ref, b_ref, vals_ref, ids_ref, lse_ref,
                run_vals, run_ids, run_m, run_s):
        """Two-stage merge: per-lane-position sorted top-k registers
        (run_vals/run_ids hold k contiguous 128-lane groups, group j =
        rank-j value at each lane position), cross-lane extraction only on
        the final tile."""
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            run_vals[:] = jnp.full_like(run_vals, NEG)
            run_ids[:] = jnp.full_like(run_ids, v)
            run_m[:] = jnp.full_like(run_m, NEG)
            run_s[:] = jnp.zeros_like(run_s)

        logits = jnp.dot(h2_ref[:], w_ref[:],
                         preferred_element_type=jnp.float32) + b_ref[0, :]

        tile_max = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(run_m[:], tile_max)
        run_s[:] = (run_s[:] * jnp.exp(run_m[:] - m_new)
                    + jnp.sum(jnp.exp(logits - m_new), axis=-1,
                              keepdims=True))
        run_m[:] = m_new

        regs_v = [run_vals[:, j * 128:(j + 1) * 128] for j in range(k)]
        regs_i = [run_ids[:, j * 128:(j + 1) * 128] for j in range(k)]
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows_blk, 128), 1)
        for c in range(n_chunks):
            x = logits[:, c * 128:(c + 1) * 128]
            xid = lane + (i * tile_v + c * 128)
            # bubble-insert x into the descending-sorted registers; ids
            # strictly increase over insertion order, so strict > keeps
            # the earlier (lower-id) of equal values ranked higher
            for j in range(k):
                swap = x > regs_v[j]
                nv = jnp.where(swap, x, regs_v[j])
                ni = jnp.where(swap, xid, regs_i[j])
                x = jnp.where(swap, regs_v[j], x)
                xid = jnp.where(swap, regs_i[j], xid)
                regs_v[j] = nv
                regs_i[j] = ni
        # per-group slice stores: a concatenate would materialize a second
        # (rows, k*128) temporary on the VMEM stack (lets tile_rows 512
        # compile; 640 still exceeds the 16 MB scope by ~1.9 MB either way)
        for j in range(k):
            run_vals[:, j * 128:(j + 1) * 128] = regs_v[j]
            run_ids[:, j * 128:(j + 1) * 128] = regs_i[j]

        @pl.when(i == n_tiles - 1)
        def _():
            # cross-lane global top-k over the k*128 survivors; ids are
            # unique across lanes, so the id-mask clears one candidate
            # per pass (sentinels only win when < k real candidates exist)
            new_vals, new_ids = _extract_topk(run_vals[:], run_ids[:])
            vals_ref[:], ids_ref[:] = _fill_out(new_vals, new_ids)
            lse_ref[:] = run_m[:] + jnp.log(run_s[:])

    from jax.experimental.pallas import tpu as pltpu

    run_lanes = k * 128 if two_stage else k_pad
    call = pl.pallas_call(
        kernel2 if two_stage else kernel,
        grid=(n_row_blocks, n_tiles),
        in_specs=[
            pl.BlockSpec((rows_blk, r_pad), lambda b, i: (b, 0)),    # h2
            pl.BlockSpec((r_pad, tile_v), lambda b, i: (0, i)),      # w_t
            pl.BlockSpec((1, tile_v), lambda b, i: (0, i)),          # bias
        ],
        out_specs=[
            pl.BlockSpec((rows_blk, k_pad), lambda b, i: (b, 0)),
            pl.BlockSpec((rows_blk, k_pad), lambda b, i: (b, 0)),
            pl.BlockSpec((rows_blk, 1), lambda b, i: (b, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((rows, k_pad), jnp.int32),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows_blk, run_lanes), jnp.float32),
            pltpu.VMEM((rows_blk, run_lanes), jnp.int32),
            pltpu.VMEM((rows_blk, 1), jnp.float32),
            pltpu.VMEM((rows_blk, 1), jnp.float32),
        ],
        interpret=interpret,
    )

    def prepare_tables(w_t, bias):
        """Pad (R, V) weights/bias once; padded vocab columns get -1e30 bias
        so they can never be selected and add 0 to the sumexp."""
        w_p = jnp.zeros((r_pad, v_pad), table_dtype)
        w_p = w_p.at[:r, :v].set(w_t.astype(table_dtype))
        b_p = jnp.full((1, v_pad), NEG, jnp.float32)
        b_p = b_p.at[0, :v].set(bias.astype(jnp.float32))
        return w_p, b_p

    def fn(h2, w_t, bias):
        if w_t.shape != (r_pad, v_pad):
            w_t, bias = prepare_tables(w_t, bias)
        elif bias.ndim == 1:
            bias = bias.reshape(1, -1)
        if h2.shape[-1] != r_pad:
            h2 = jnp.pad(h2, ((0, 0), (0, r_pad - h2.shape[-1])))
        vals, ids, lse = call(h2.astype(lhs_dtype), w_t, bias)
        return vals[:, :k], ids[:, :k], lse

    fn.prepare_tables = prepare_tables
    fn.r_pad = r_pad
    fn.v_pad = v_pad
    return fn


@functools.lru_cache(maxsize=32)
def _cached_kernel(rows, r, v, k, tile_v, tile_rows, interpret,
                   table_dtype_name, two_stage, lhs_dtype_name):
    return make_vocab_topk_lse(rows, r, v, k, tile_v=tile_v,
                               tile_rows=tile_rows, interpret=interpret,
                               table_dtype=jnp.dtype(table_dtype_name),
                               two_stage=two_stage,
                               lhs_dtype=jnp.dtype(lhs_dtype_name))


def get_vocab_topk(rows, r, v, k, tile_v=1024, tile_rows=1280,
                   interpret=False, table_dtype=jnp.float32,
                   two_stage=False, lhs_dtype=jnp.float32):
    return _cached_kernel(rows, r, v, k, tile_v, tile_rows, interpret,
                          np.dtype(table_dtype).name, two_stage,
                          np.dtype(lhs_dtype).name)
