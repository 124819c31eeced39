"""High-level model facades mirroring the reference's public API.

`ControllableCaptioner` exposes forward/test/sample_rl/beam_search_v like the
reference ControllableCaptioningModel, backed by the jitted scan loops in
`vsrcic_tpu.decode`. Jitted callables are constructed once; XLA's trace cache
handles shape variants.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vsrcic_tpu.decode.beam import BeamResult, beam_search_joint
from vsrcic_tpu.decode.loops import (
    forward_teacher_forcing, greedy_decode, sample_decode)
from vsrcic_tpu.models.captioner import (
    CaptionerConfig, VerbTenseTable, captioner_step, captioner_step_v,
    init_captioner_params, init_state, precompute_statics)


def build_verb_tense_table(verb_2_vob_all: Dict[str, list],
                           n_verbs: Optional[int] = None) -> VerbTenseTable:
    """{str(verb_code): [vocab ids]} (verb_2_vob_all_refine.json schema,
    ref controllable_captioning.py:26) -> dense (n_verbs+1, K) id table."""
    keys = [int(k) for k in verb_2_vob_all.keys()]
    n = max(keys + [n_verbs or 0]) + 1 if keys else (n_verbs or 1) + 1
    k_max = max([len(v) for v in verb_2_vob_all.values()] + [1])
    ids = np.full((n, k_max), -1, np.int32)
    for k, v in verb_2_vob_all.items():
        ids[int(k), :len(v)] = v
    return VerbTenseTable(jnp.asarray(ids))


class ControllableCaptioner:
    def __init__(self, cfg: CaptionerConfig, params=None, key=None,
                 verb_2_vob_all: Optional[Dict] = None,
                 decode_dtype=None, use_fused_attention: bool = False,
                 table_dtype=None, use_vocab_topk=False, step_dtype=None,
                 pallas_interpret: bool = False,
                 beam_gather_take_along: Optional[bool] = None,
                 beam_select_passenger: Optional[bool] = None):
        """decode_dtype: cast params for decode (measured SLOWER on TPU than
        default-precision fp32 — see docs/ENGINEERING_NOTES.md; kept as an
        option). table_dtype: storage dtype for the beam statics tables
        (det_groups/proj) — jnp.bfloat16 halves the dominant decode-step DMA
        bytes (+3% measured with the fused kernel); scores/softmaxes stay
        fp32 either way. use_fused_attention: route beam_search_v's group
        gather + attention through the fused Pallas kernel (TPU only)."""
        self.cfg = cfg
        if params is None:
            params = init_captioner_params(
                key if key is not None else jax.random.PRNGKey(1234), cfg)
        self.params = params
        self.use_fused_attention = use_fused_attention
        # use_vocab_topk: False | True (Pallas streaming kernel, TPU) |
        # "xla" (reference impl, any backend) — candidate-based beam that
        # never materializes (rows, V) word logprobs
        self.use_vocab_topk = use_vocab_topk
        # run the Pallas kernels in interpreter mode (any backend; tests)
        self.pallas_interpret = pallas_interpret
        # step_dtype (e.g. bf16): surgical weight-storage cast for the big
        # decode-step matmuls (see derive_fused_step_weights); fast path
        self.step_dtype = step_dtype
        # beam parent-state gather form: flat global-row gather (False, the
        # measured-faster default) vs reshape+take_along_axis (True). The
        # VSRCIC_BEAM_TAKE_ALONG env var is honored ONCE here, at
        # construction — never inside traced code (it would be captured
        # silently at first trace and ignored afterwards).
        if beam_gather_take_along is None:
            import os
            beam_gather_take_along = bool(int(
                os.environ.get("VSRCIC_BEAM_TAKE_ALONG", "0")))
        self.beam_gather_take_along = beam_gather_take_along
        # candidate-beam joint select form: passenger-operand sort (True —
        # wlp/glp ride the sort, beam/word/gate derived from the vidx key)
        # vs position-iota sort + four take_along gathers (False). Bit-exact
        # either way (see decode/beam.py); on-chip A/B 8427 vs 8102 caps/s
        # (scripts/ab_select_passenger.py) — passenger is the default.
        # Env honored once, at construction.
        if beam_select_passenger is None:
            import os
            beam_select_passenger = bool(int(
                os.environ.get("VSRCIC_SELECT_PASSENGER", "1")))
        self.beam_select_passenger = beam_select_passenger
        # dense-beam logprob record form: flat (beam*V) gather with the EOS
        # mask applied to the K selected values (True) vs nested
        # take_along_axis over a pre-masked (B, K, V) block (False). Bit-
        # exact either way (tests/test_beam_more.py); on-chip A/B 521 vs
        # 577 ms/1024-decode on the strict path (+10.7%,
        # scripts/ab_rec_flat.py) — flat is the default. Env honored once,
        # at construction.
        import os as _os
        self.beam_rec_flat = bool(int(
            _os.environ.get("VSRCIC_REC_FLAT", "1")))
        self._fused_cache = {}
        self.decode_dtype = decode_dtype
        self.table_dtype = table_dtype
        self.decode_params = (
            jax.tree.map(lambda x: x.astype(decode_dtype), params)
            if decode_dtype is not None else params)
        self.tense_table = (build_verb_tense_table(verb_2_vob_all)
                            if verb_2_vob_all is not None else None)

        self._forward = jax.jit(partial(forward_teacher_forcing, cfg=cfg))
        self._greedy = jax.jit(self._greedy_impl)
        self._sample = jax.jit(self._sample_impl)
        self._beam_v = jax.jit(self._beam_v_impl,
                               static_argnames=("beam_size", "eos_word", "gt"))
        self._beam = jax.jit(self._beam_impl,
                             static_argnames=("beam_size", "eos_word"))

    # -- impls ---------------------------------------------------------------
    def _greedy_impl(self, params, detections, det_groups):
        statics, fused, fw = self._fused_statics(params, detections,
                                                 det_groups)
        return greedy_decode(params, self.cfg, statics, fused_fn=fused,
                             fused_w=fw)

    def _sample_impl(self, params, detections, det_groups, rng):
        statics, fused, fw = self._fused_statics(params, detections,
                                                 det_groups)
        return sample_decode(params, self.cfg, statics, rng, fused_fn=fused,
                             fused_w=fw)

    def _expand(self, a, k):
        return jnp.repeat(a, k, axis=0)

    def _cast(self, a):
        dt = self.table_dtype or self.decode_dtype
        return (a.astype(dt) if dt is not None
                and jnp.issubdtype(a.dtype, jnp.floating) else a)

    def _fused_fn(self, b, l, m, d, beam):
        key = (b, l, m, d, beam)
        if key not in self._fused_cache:
            from vsrcic_tpu.ops.fused_attention import \
                make_fused_group_attention
            rows = b * beam
            import os
            # block rows: more rows/block = more DMAs in flight (the kernel
            # issues every row's copy up front) + fewer grid steps; VMEM
            # scratch grows as rows_per_block * m_pad * (D + A). On-chip
            # sweep (scripts/ab_fused_rpb.py): 8=6060, 16=6289, **32=6385**,
            # 48=6064, 64=6196 caps/s — 32 is the knee before VMEM pressure
            pref = int(os.environ.get("VSRCIC_FUSED_RPB", "32"))
            rpb = next(r for r in (pref, 32, 16, 8, 4, 2, 1)
                       if rows % r == 0)
            self._fused_cache[key] = make_fused_group_attention(
                b, l, m, d, self.cfg.att_size, rows=rows,
                rows_per_block=rpb, interpret=self.pallas_interpret,
                table_dtype=self.table_dtype or self.decode_dtype
                or jnp.float32)
        return self._fused_cache[key]

    def _fused_statics(self, params, detections, det_groups, verb_list=None,
                       beam=1):
        """Statics + fused kernel for feedback decodes (shared by greedy/
        sample/beam paths); returns (statics, fused_fn-or-None)."""
        statics = precompute_statics(params, self.cfg,
                                     self._cast(detections),
                                     self._cast(det_groups),
                                     verb_list=verb_list)
        if not self.use_fused_attention:
            return statics, None, None
        if detections.shape[0] * beam % 8 and not self.pallas_interpret:
            # Pallas TPU requires row blocks divisible by 8; fall back to
            # the XLA step for odd batches (e.g. SCST batch 100) rather
            # than crash — pad the batch to a multiple of 8 to get the
            # fused path. NB the table-dtype cast above still applies.
            import warnings
            warnings.warn(
                "use_fused_attention: batch*beam=%d is not a multiple of 8;"
                " falling back to the XLA step (pad the batch to get the"
                " fused kernel)" % (detections.shape[0] * beam),
                stacklevel=2)
            return statics, None, None
        if ((det_groups.shape[3] % 128 or self.cfg.att_size % 128)
                and not self.pallas_interpret):
            # the kernel's HBM->VMEM row copies slice the feature (D) and
            # attention (A) axes as whole lanes, so both must be multiples
            # of the 128-lane tiling (reference sizes: D=2048, A=512).
            # Tiny test-model shapes (e.g. A=16) would fail Mosaic layout
            # checks at compile — fall back to the XLA step instead.
            import warnings
            warnings.warn(
                "use_fused_attention: feature dim %d / att_size %d not"
                " 128-aligned; falling back to the XLA step"
                % (det_groups.shape[3], self.cfg.att_size), stacklevel=2)
            return statics, None, None
        fused = self._fused_fn(detections.shape[0], det_groups.shape[1],
                               det_groups.shape[2], det_groups.shape[3],
                               beam)
        from vsrcic_tpu.models.captioner import Statics
        tdt = (self.table_dtype or self.decode_dtype
               or statics.det_groups.dtype)
        groups = statics.det_groups.astype(tdt)
        proj = statics.det_groups_proj.astype(tdt)
        if groups.shape[2] != fused.m_pad:
            pad = [(0, 0), (0, 0), (0, fused.m_pad - groups.shape[2]),
                   (0, 0)]
            groups = jnp.pad(groups, pad)
            proj = jnp.pad(proj, pad)
        from vsrcic_tpu.models.captioner import (_mm,
                                                 derive_fused_step_weights)
        fw = derive_fused_step_weights(params, dtype=self.step_dtype,
                                       cfg=self.cfg)
        # hoist the image-descriptor slice of the input_1 projection out of
        # the decode scan (step-invariant; ~half of the per-step y_x FLOPs)
        img_y = (_mm(statics.image_descriptor.astype(jnp.float32),
                     fw["wx_img"]) + fw["bx"]
                 if "wx_img" in fw else None)
        statics = Statics(statics.image_descriptor, groups, proj,
                          statics.det_groups_mask, statics.verb_list,
                          img_y=img_y)
        return statics, fused, fw

    def _vocab_topk_fn(self, rows, k):
        """Streaming Pallas top-k+lse kernel (TPU) or the XLA reference."""
        from vsrcic_tpu.ops.vocab_topk import (get_vocab_topk,
                                               vocab_topk_lse_xla)
        if self.use_vocab_topk == "xla":
            return lambda h2, w_t, b: vocab_topk_lse_xla(h2, w_t, b, k)
        import os
        tile_v = int(os.environ.get("VSRCIC_VOCAB_TILE", "1024"))
        # two-stage merge needs (rows_blk, k*128) x2 running scratch plus the
        # per-chunk register temporaries, so its default row block drops to
        # 320 to stay inside the 16 MB scoped-VMEM limit (640 compiles to a
        # 17.9 MB stack and is rejected by the TPU compiler)
        # default on: the interleaved on-chip A/B (scripts/ab_vocab_e2e.py)
        # has two-stage@320 at 176.1 ms/decode vs streaming@1280 at 178.3,
        # token-exact, ordering stable across every interleaved round
        two_stage = bool(int(os.environ.get("VSRCIC_VOCAB_TWO_STAGE", "1")))
        tile_rows = int(os.environ.get("VSRCIC_VOCAB_TILE_ROWS",
                                       "320" if two_stage else "1280"))
        # lhs bf16 (VSRCIC_VOCAB_LHS_BF16=1): cast h2 outside the kernel so
        # the dot is single-pass bf16 MXU; fast-path-only numerics change
        # on top of the bf16 tables (A/B + fidelity in ENGINEERING_NOTES)
        lhs_bf16 = bool(int(os.environ.get("VSRCIC_VOCAB_LHS_BF16", "0")))
        return get_vocab_topk(
            rows, self.cfg.rnn_size, self.cfg.vocab_size, k,
            tile_v=tile_v, tile_rows=tile_rows,
            interpret=self.pallas_interpret,
            table_dtype=self.table_dtype or jnp.float32,
            two_stage=two_stage,
            lhs_dtype=jnp.bfloat16 if lhs_bf16 else jnp.float32)

    def _vocab_tables(self, vocab_fn):
        """out_fc weights transposed (+padded/cast for the Pallas kernel),
        computed once per captioner and passed as jit args."""
        # cache key includes the kernel's padded vocab width: the tile env
        # vars (VSRCIC_VOCAB_TILE*) can change v_pad mid-process, and stale
        # tables would silently mismatch the new kernel shape
        kind = ("pallas" if hasattr(vocab_fn, "prepare_tables") else "xla",
                getattr(vocab_fn, "v_pad", None))
        if getattr(self, "_vocab_tables_cache", (None, None))[0] != kind:
            w_t = self.decode_params["out_fc"]["weight"].T
            bias = self.decode_params["out_fc"]["bias"]
            if kind[0] == "pallas":
                tables = vocab_fn.prepare_tables(w_t, bias)
            else:
                tables = (w_t, bias)
            self._vocab_tables_cache = (kind, tables)
        return self._vocab_tables_cache[1]

    def _beam_v_impl(self, params, detections, det_groups, verb_list,
                     beam_size, eos_word, gt, vocab_tables=None):
        # statics stay UNEXPANDED (per item); the steps gather per beam row
        b = detections.shape[0]
        statics, fused, fw = self._fused_statics(params, detections,
                                                 det_groups,
                                                 verb_list=verb_list,
                                                 beam=beam_size)

        if self.use_vocab_topk:
            from vsrcic_tpu.decode.beam import beam_search_joint_candidates
            from vsrcic_tpu.models.captioner import captioner_step_v_topk
            vocab_fn = self._vocab_topk_fn(b * beam_size, beam_size)
            # padded+cast once per captioner, passed as jit args (in-trace
            # prep would re-pad the (R, V) table every call; closure capture
            # would bake a multi-MB constant into the compiled program)
            tables = vocab_tables

            def step_fn(state, pw, pg, t0):
                return captioner_step_v_topk(
                    params, self.cfg, state, statics, self.tense_table,
                    vocab_fn, tables, prev_word=pw, prev_gate=pg, t0=t0,
                    gt=gt, beam=beam_size, k=beam_size, fused_fn=fused,
                    fused_w=fw)

            return beam_search_joint_candidates(
                step_fn, init_state(self.cfg, b * beam_size), b, beam_size,
                self.cfg.seq_len, eos_word=eos_word,
                vocab_size=self.cfg.vocab_size,
                gather_take_along=self.beam_gather_take_along,
                select_passenger=self.beam_select_passenger)

        def step_fn(state, pw, pg, t0):
            return captioner_step_v(params, self.cfg, state, statics,
                                    self.tense_table, prev_word=pw,
                                    prev_gate=pg, t0=t0, gt=gt,
                                    beam=beam_size, fused_fn=fused,
                                    fused_w=fw)

        return beam_search_joint(step_fn, init_state(self.cfg, b * beam_size),
                                 b, beam_size, self.cfg.seq_len,
                                 eos_word=eos_word,
                                 gather_take_along=self.beam_gather_take_along,
                                 rec_flat=self.beam_rec_flat)

    def _beam_impl(self, params, detections, det_groups, beam_size, eos_word):
        b = detections.shape[0]
        statics, fused, fw = self._fused_statics(params, detections,
                                                 det_groups, beam=beam_size)

        def step_fn(state, pw, pg, t0):
            return captioner_step(params, self.cfg, state, statics,
                                  prev_word=pw, prev_gate=pg, t0=t0,
                                  beam=beam_size, fused_fn=fused, fused_w=fw)

        return beam_search_joint(step_fn, init_state(self.cfg, b * beam_size),
                                 b, beam_size, self.cfg.seq_len,
                                 eos_word=eos_word,
                                 gather_take_along=self.beam_gather_take_along,
                                 rec_flat=self.beam_rec_flat)

    # -- public API (reference parity) ---------------------------------------
    def forward(self, detections, captions, ctrl_det_seqs):
        return self._forward(self.params, detections=jnp.asarray(detections),
                             captions=jnp.asarray(captions),
                             ctrl_det_seqs=jnp.asarray(ctrl_det_seqs))

    def __call__(self, statics, seqs):
        """Reference calling convention: model((detections,), (captions,
        ctrl_det_seqs)) (ref coco_scripts/train.py:103)."""
        return self.forward(statics[0], seqs[0], seqs[1])

    def test(self, detections, ctrl_det_seqs_test):
        return self._greedy(self.decode_params, jnp.asarray(detections),
                            jnp.asarray(ctrl_det_seqs_test))

    def sample_rl(self, detections, ctrl_det_seqs_test, rng):
        return self._sample(self.params, jnp.asarray(detections),
                            jnp.asarray(ctrl_det_seqs_test), rng)

    def beam_search_v(self, detections, det_groups, verb_list, eos_word,
                      beam_size=5, gt=False) -> BeamResult:
        tables = None
        if self.use_vocab_topk:
            b = jnp.asarray(detections).shape[0]
            tables = self._vocab_tables(
                self._vocab_topk_fn(b * beam_size, beam_size))
        return self._beam_v(self.decode_params, jnp.asarray(detections),
                            jnp.asarray(det_groups),
                            jnp.asarray(verb_list).astype(jnp.int32),
                            beam_size=beam_size, eos_word=eos_word, gt=gt,
                            vocab_tables=tables)

    def beam_search(self, detections, det_groups, eos_word,
                    beam_size=5) -> BeamResult:
        return self._beam(self.decode_params, jnp.asarray(detections),
                          jnp.asarray(det_groups), beam_size=beam_size,
                          eos_word=eos_word)
