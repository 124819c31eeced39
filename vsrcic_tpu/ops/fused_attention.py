"""Fused Pallas kernel: region-group gather + sentinel attention + shift-gate
evidence, for the role-shift captioner's decode step.

Motivation (profiled, docs/ENGINEERING_NOTES.md): the decode step's dominant
costs are the (rows, M, D) group gather (HLO fusion.441, ~0.79 ms at 1/3 of
HBM peak) and the attention weighted-sum chain over its output (~0.5 ms).
This kernel replaces that chain with one pass: per decode row, the
(item, ctrl)-indexed group row is DMA'd HBM->VMEM (double-buffered, indices
scalar-prefetched) and the additive attention + masked renormalization +
weighted sum + gate evidence all happen on-chip — group features are read
from HBM exactly once and never materialized as an (rows, M, D) tensor.

Semantics == the XLA path in models/captioner._step_core (ref
controllable_captioning.py:161-188):

    det_w   = att_a( tanh(proj + ha) )                 (M,)
    att     = softmax([sent_w ; det_w]) * [sent_mask ; mask]; att /= sum
    att_det = att[0] * fc_sentinel + att[1:] @ det     (D,)
    g_evid  = sum(mask * det_w)                        (1,)
"""
from __future__ import annotations


import jax
import jax.numpy as jnp


def fused_m_pad(m: int) -> int:
    """Region-axis padding the kernel's HBM DMA slices require (8-row
    sublane tiling). Single source of truth — the eval pipeline emits
    recons pre-padded with this same rule."""
    return ((m + 7) // 8) * 8


def make_fused_group_attention(b_items: int, l: int, m: int, d: int, a: int,
                               rows: int, rows_per_block: int = 8,
                               interpret: bool = False,
                               table_dtype=jnp.float32):
    """Build the fused kernel for static shapes.

    Returns fn(item, ctrl, ha, sent_w, sent_mask, fc_sentinel, att_a_vec,
               det_groups, groups_proj) -> (att_detections (rows, D),
                                            gate_evidence (rows, 1))
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert rows % rows_per_block == 0
    n_blocks = rows // rows_per_block
    # HBM DMA slices must be aligned to the (8, 128) tiling on the
    # second-to-last dim: pad M up; padded rows are all-zero -> masked out
    m_pad = fused_m_pad(m)

    def kernel(item_ref, ctrl_ref, ha_ref, sentw_ref, sentmask_ref,
               fcsent_ref, atta_ref, det_hbm, proj_hbm,
               out_att_ref, out_gsum_ref, det_buf, proj_buf, sem_d, sem_p):
        i = pl.program_id(0)

        def dma(slot, blk, j):
            r = blk * rows_per_block + j
            it = item_ref[r]
            ct = ctrl_ref[r]
            cd = pltpu.make_async_copy(det_hbm.at[it, ct],
                                       det_buf.at[slot, j],
                                       sem_d.at[slot, j])
            cp = pltpu.make_async_copy(proj_hbm.at[it, ct],
                                       proj_buf.at[slot, j],
                                       sem_p.at[slot, j])
            return cd, cp

        # block-level double buffering: every row of a block gets its own
        # buffer slot and all copies are issued before any wait (a single
        # double-buffered row loop was DMA-LATENCY-bound at ~25% of HBM
        # peak for the 614 MB/step stream); block i+1's copies are issued
        # while block i computes, so up to 4*rows_per_block are in flight
        def start_block(blk, slot):
            def start(j, _):
                cd, cp = dma(slot, blk, j)
                cd.start()
                cp.start()
                return 0
            jax.lax.fori_loop(0, rows_per_block, start, 0, unroll=True)

        slot = jax.lax.rem(i, 2)

        @pl.when(i == 0)
        def _():
            start_block(i, slot)

        @pl.when(i + 1 < n_blocks)
        def _():
            start_block(i + 1, jax.lax.rem(i + 1, 2))

        def wait(j, _):
            cdj, cpj = dma(slot, i, j)
            cdj.wait()
            cpj.wait()
            return 0

        jax.lax.fori_loop(0, rows_per_block, wait, 0, unroll=True)

        # whole-block vectorized compute (the per-row form serialized
        # rows_per_block tiny VPU ops behind the scalar loop)
        det = det_buf[slot].astype(jnp.float32)       # (R, m_pad, D)
        proj = proj_buf[slot].astype(jnp.float32)      # (R, m_pad, A)
        mask = (jnp.sum(det, axis=-1, keepdims=True) != 0
                ).astype(jnp.float32)                  # (R, M, 1)
        ha = ha_ref[:]                                 # (R, A)
        det_w = jnp.sum(jnp.tanh(proj + ha[:, None, :])
                        * atta_ref[0, :][None, None, :],
                        axis=-1, keepdims=True)        # (R, M, 1)
        sent_w = sentw_ref[:]                          # (R, 1)
        sent_mask = sentmask_ref[:]                    # (R, 1)

        mx = jnp.maximum(jnp.max(det_w[:, :, 0], axis=-1, keepdims=True),
                         sent_w)                       # (R, 1)
        e_det = jnp.exp(det_w - mx[:, :, None])        # (R, M, 1)
        e_sent = jnp.exp(sent_w - mx)                  # (R, 1)
        att_det = e_det * mask
        att_sent = e_sent * sent_mask                  # (R, 1)
        denom = (jnp.sum(att_det[:, :, 0], axis=-1, keepdims=True)
                 + att_sent)                           # (R, 1)
        att_det = att_det / denom[:, :, None]
        att_sent = att_sent / denom

        out = (jnp.sum(att_det * det, axis=1)
               + att_sent * fcsent_ref[:])             # (R, D)
        out_att_ref[:] = out
        out_gsum_ref[:] = jnp.sum((mask * det_w)[:, :, 0], axis=-1,
                                  keepdims=True)       # (R, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((rows_per_block, a), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),   # ha
            pl.BlockSpec((rows_per_block, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),   # sent_w
            pl.BlockSpec((rows_per_block, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),   # sent_mask
            pl.BlockSpec((rows_per_block, d), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),   # fc_sentinel
            pl.BlockSpec((1, a), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),   # att_a vec
            pl.BlockSpec(memory_space=pl.ANY),       # det_groups (HBM)
            pl.BlockSpec(memory_space=pl.ANY),       # groups_proj (HBM)
        ],
        out_specs=[
            pl.BlockSpec((rows_per_block, d), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_block, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, rows_per_block, m_pad, d), table_dtype),
            pltpu.VMEM((2, rows_per_block, m_pad, a), table_dtype),
            pltpu.SemaphoreType.DMA((2, rows_per_block)),
            pltpu.SemaphoreType.DMA((2, rows_per_block)),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((rows, d), jnp.float32),
                   jax.ShapeDtypeStruct((rows, 1), jnp.float32)],
        interpret=interpret,
    )

    def fn(item, ctrl, ha, sent_w, sent_mask, fc_sentinel, att_a_vec,
           det_groups, groups_proj):
        # callers must pass tables already padded to m_pad (pad ONCE at
        # statics construction, never per decode step)
        if det_groups.shape[2] != m_pad:
            pad = [(0, 0), (0, 0), (0, m_pad - det_groups.shape[2]), (0, 0)]
            det_groups = jnp.pad(det_groups, pad)
            groups_proj = jnp.pad(groups_proj, pad)
        att_det, gsum = call(item.astype(jnp.int32), ctrl.astype(jnp.int32),
                             ha, sent_w, sent_mask, fc_sentinel,
                             att_a_vec.reshape(1, a),
                             det_groups, groups_proj)
        return att_det, gsum

    fn.m_pad = m_pad
    return fn
