"""Captioner trainers: XE and SCST CIDEr RL.

XE (ref coco_scripts/train.py:92-120): NLL(word) + 4*NLL(gate, ignore -1),
Adam + StepLR(3, 0.8), per-epoch val CIDEr best-checkpoint selection with
patience 5.

SCST (ref train.py:121-183): the reference round-trips
GPU->CPU->Java->CPU->GPU every step for tokenization + CIDEr (SURVEY.md §3.2).
Here: sampling and the greedy baseline run as jitted device decodes, rewards
use the native tokenizer+CIDEr on host (microseconds/caption), and the grad
step recomputes trajectory logprobs in-graph (decode.forced_feedback_logprobs)
— loss = -(mean word logp + mean gate logp) * (CIDEr(sample)-CIDEr(greedy)).

Both train steps are jitted with `data`-axis batch sharding when a mesh is
provided (GSPMD inserts the gradient psum).
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vsrcic_tpu.decode.loops import (
    forced_feedback_logprobs, forward_teacher_forcing, greedy_decode,
    sample_decode)
from vsrcic_tpu.models.captioner import CaptionerConfig, precompute_statics
from vsrcic_tpu.train.common import (
    TrainState, adam, apply_grads, init_train_state, nll_loss,
    set_learning_rate)
from vsrcic_tpu.metrics.cider import Cider
from vsrcic_tpu.text.vocab import TextField, dedup_join
from vsrcic_tpu.text.tokenizer import ptb_tokenize


def xe_loss_fn(params, cfg: CaptionerConfig, detections, captions,
               ctrl_det_seqs, gate_targets, lean: bool = True):
    """ref train.py:103-110 (word loss shifted; gate loss unshifted,
    weighted 4x, padding ignored via index -1).

    ctrl_det_seqs: dense (B, T, M, D) float groups OR compact (B, T, M) int
    group indices. Compact ids take the memory-lean path by default
    (per-step expansion under jax.checkpoint, `_xe_loss_compact`): the
    backward pass at batch 1024 otherwise keeps the expanded (T, B, M, D)
    group tensors as residuals and OOMs HBM (20.4 G > 15.75 G,
    docs/ENGINEERING_NOTES). lean=False restores the expand-once dense
    path (more residual memory, no recompute — the call for small-batch
    jobs where HBM is not the constraint).
    """
    if jnp.issubdtype(ctrl_det_seqs.dtype, jnp.integer):
        if lean:
            return _xe_loss_compact(params, cfg, detections, captions,
                                    ctrl_det_seqs, gate_targets)
        from vsrcic_tpu.decode.loops import expand_compact_groups
        ctrl_det_seqs = expand_compact_groups(detections, ctrl_det_seqs)
    word_logp, gate_logp = forward_teacher_forcing(
        params, cfg, detections, captions, ctrl_det_seqs)
    loss_cap = nll_loss(word_logp[:, :-1], captions[:, 1:])
    loss_gate = nll_loss(gate_logp, gate_targets, ignore_index=-1)
    return loss_cap + 4.0 * loss_gate, (loss_cap, loss_gate)


def _xe_loss_compact(params, cfg: CaptionerConfig, detections, captions,
                     det_ids, gate_targets):
    """XE loss from COMPACT (B, T, M) int group ids, memory-lean.

    Numerically equal to the dense path (pinned in tests/test_trainers.py)
    but the per-step group expansion + att projection run INSIDE a
    `jax.checkpoint`'d scan body and the per-step NLL terms are reduced
    in-scan — neither the (B, T, M, D) group tensor nor the (B, T, V)
    logits ever materialize, and the backward recomputes the step instead
    of storing its internals. Residual footprint drops from O(B*T*M*D) to
    O(B*T*M) ids + the (B,) carries, unlocking batch 1024+ on one chip
    (ref train.py:103-113 is the loss this computes).
    """
    from vsrcic_tpu.core import nn
    from vsrcic_tpu.decode.loops import expand_compact_groups
    from vsrcic_tpu.models.captioner import (CaptionerState, _step_core,
                                             init_state)

    b, t_len = captions.shape
    captions = captions.astype(jnp.int32)
    det_mask = (jnp.sum(detections, -1, keepdims=True)
                != 0).astype(detections.dtype)
    image_descriptor = jnp.sum(detections, 1) / jnp.sum(det_mask, 1)

    # word loss is shifted (step t predicts captions[:, t+1], last step
    # unused); gate loss is unshifted with -1 ignored — ref train.py:105-108
    tgt_next = jnp.concatenate(
        [captions[:, 1:], jnp.zeros((b, 1), jnp.int32)], axis=1)
    w_on = (jnp.arange(t_len) < t_len - 1).astype(detections.dtype)
    xs = (jnp.moveaxis(captions, 1, 0),                  # it (T, B)
          jnp.moveaxis(det_ids, 1, 0),                   # ids (T, B, M)
          jnp.moveaxis(tgt_next, 1, 0),                  # word targets
          jnp.moveaxis(jnp.asarray(gate_targets).astype(jnp.int32), 1, 0),
          w_on)

    def body(state, x):
        it, ids_t, tgt_t, gate_t, on_t = x
        det_curr = expand_compact_groups(detections, ids_t)   # (B, M, D)
        det_proj = nn.linear(params["att_va"], det_curr)
        mask = (jnp.sum(det_curr, -1) != 0).astype(det_curr.dtype)
        (w_logp, g_logp), (h1, c1, h2, c2) = _step_core(
            params, cfg, state, it, det_curr, det_proj, mask,
            image_descriptor)
        w_lp = jnp.take_along_axis(w_logp, tgt_t[:, None], 1)[:, 0]
        g_valid = (gate_t != -1)
        g_lp = jnp.take_along_axis(
            g_logp, jnp.clip(gate_t, 0, 1)[:, None], 1)[:, 0]
        out = (jnp.sum(w_lp) * on_t,
               jnp.sum(g_lp * g_valid),
               jnp.sum(g_valid.astype(jnp.float32)))
        return CaptionerState(h1, c1, h2, c2, state.ctrl_det_idx), out

    # prevent_cse=False is safe (and cheaper) under lax.scan
    body = jax.checkpoint(body, prevent_cse=False)
    _, (w_sums, g_sums, g_counts) = jax.lax.scan(
        body, init_state(cfg, b), xs)
    loss_cap = -jnp.sum(w_sums) / (b * (t_len - 1))
    loss_gate = -jnp.sum(g_sums) / jnp.maximum(jnp.sum(g_counts), 1.0)
    return loss_cap + 4.0 * loss_gate, (loss_cap, loss_gate)


class CaptionerXETrainer:
    def __init__(self, cfg: CaptionerConfig, params, lr: float = 5e-4,
                 mesh=None, lean: bool = True):
        """lean: compact-id batches use the rematted per-step scan loss
        (required for batch 1024+ on one chip; see xe_loss_fn). lean=False
        keeps the expand-once dense-residual loss for small batches."""
        self.cfg = cfg
        self.tx = adam(lr)
        self.state = init_train_state(params, self.tx)
        self.mesh = mesh

        def train_step(state: TrainState, detections, captions,
                       ctrl_det_seqs, gate_targets):
            (loss, (lc, lg)), grads = jax.value_and_grad(
                xe_loss_fn, has_aux=True)(
                state.params, cfg, detections, captions, ctrl_det_seqs,
                gate_targets, lean=lean)
            state = apply_grads(self.tx, state, grads)
            return state, loss, lc, lg

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            data = NamedSharding(mesh, P("data"))
            rep = NamedSharding(mesh, P())
            self._train_step = jax.jit(
                train_step,
                in_shardings=(rep, data, data, data, data),
                out_shardings=(rep, rep, rep, rep))
        else:
            self._train_step = jax.jit(train_step)

    def set_lr(self, lr: float):
        self.state = TrainState(self.state.params,
                                set_learning_rate(self.state.opt_state, lr),
                                self.state.step)

    def step(self, detections, captions, ctrl_det_seqs, gate_targets):
        self.state, loss, lc, lg = self._train_step(
            self.state, jnp.asarray(detections),
            jnp.asarray(captions).astype(jnp.int32),
            jnp.asarray(ctrl_det_seqs),
            jnp.asarray(gate_targets).astype(jnp.int32))
        return float(loss), float(lc), float(lg)


def scst_loss_fn(params, cfg: CaptionerConfig, detections, det_groups,
                 words, gates, advantage, remat: bool = False):
    statics = precompute_statics(params, cfg, detections, det_groups)
    w_lps, g_lps = forced_feedback_logprobs(params, cfg, statics, words,
                                            gates, remat=remat)
    per_seq = -(jnp.mean(w_lps, -1) + jnp.mean(g_lps, -1)) * advantage
    return jnp.mean(per_seq)


class CaptionerSCSTTrainer:
    """Self-critical sequence training with native in-step CIDEr reward.

    Two baseline schemes:
      * ``baseline="step"`` — greedy decode with the *live* params every
        step, fused with the sampled decode into ONE jitted program
        (statics computed once, both decodes share them);
      * ``baseline="epoch"`` — the reference scheme (ref train.py:122-138):
        a full greedy pass at epoch start snapshots per-batch baseline
        captions; RL steps then sample only and score against the frozen
        snapshot (call `epoch_baseline_caps` per batch at epoch start and
        pass the result to `step(..., baseline_caps=...)`).
    """

    def __init__(self, cfg: CaptionerConfig, params, text_field: TextField,
                 cider: Cider, lr: float = 5e-4, mesh=None,
                 baseline: str = "step", fast_decode: bool = False,
                 table_dtype=None, pallas_interpret: bool = False,
                 remat: bool = True, native_cider=None):
        """remat: jax.checkpoint the grad pass's per-step internals (same
        gradients, ~1 extra forward in backward) — required for batch 1024+
        on one chip; see forced_feedback_logprobs.

        native_cider: optional metrics.cider_native.NativeCiderPair built
        on the same (tokenized) df corpus as `cider` — takes the per-step
        reward off the host critical path (values equal to the Python
        scorer to 1e-12; tests/test_cider_native.py)."""
        if baseline not in ("step", "epoch"):
            raise ValueError("baseline must be 'step' or 'epoch'")
        self.cfg = cfg
        self.text_field = text_field
        self.cider = cider
        self.native_cider = native_cider
        self.baseline = baseline
        self.tx = adam(lr)
        self.state = init_train_state(params, self.tx)

        # fast_decode: run the RL sample/greedy decodes through the fused
        # Pallas attention + fused/hoisted step weights (the beam fast path).
        # Decode math reassociates (fp-level) so sampled trajectories can
        # differ from the strict path's on near-ties; the GRADIENT logprobs
        # (scst_loss_fn -> forced_feedback_logprobs) stay on the strict path
        # either way, so the objective is the same estimator.
        self._fast = None
        if fast_decode:
            from vsrcic_tpu.models.api import ControllableCaptioner
            self._fast = ControllableCaptioner(
                cfg, params=params, use_fused_attention=True,
                table_dtype=table_dtype, pallas_interpret=pallas_interpret)
            # this instance is a kernel factory only: every decode threads
            # the LIVE state.params explicitly, so poison the construction-
            # time params — any future path reading self._fast.params /
            # .decode_params would silently use stale epoch-0 weights
            self._fast.params = None
            self._fast.decode_params = None

        def decode_statics(params, detections, det_groups):
            if self._fast is not None:
                return self._fast._fused_statics(params, detections,
                                                 det_groups)
            return precompute_statics(params, cfg, detections,
                                      det_groups), None, None

        def sample_and_greedy(params, detections, det_groups, rng):
            statics, fused, fw = decode_statics(params, detections,
                                                det_groups)
            sampled = sample_decode(params, cfg, statics, rng,
                                    fused_fn=fused, fused_w=fw)
            base_words, _ = greedy_decode(params, cfg, statics,
                                          fused_fn=fused, fused_w=fw)
            return sampled, base_words

        def sample_step(params, detections, det_groups, rng):
            statics, fused, fw = decode_statics(params, detections,
                                                det_groups)
            return sample_decode(params, cfg, statics, rng, fused_fn=fused,
                                 fused_w=fw)

        def greedy_step(params, detections, det_groups):
            statics, fused, fw = decode_statics(params, detections,
                                                det_groups)
            return greedy_decode(params, cfg, statics, fused_fn=fused,
                                 fused_w=fw)

        def grad_step(state: TrainState, detections, det_groups, words,
                      gates, advantage):
            loss, grads = jax.value_and_grad(scst_loss_fn)(
                state.params, cfg, detections, det_groups, words, gates,
                advantage, remat=remat)
            return apply_grads(self.tx, state, grads), loss

        self.mesh = mesh
        if mesh is None:
            self._sample_and_greedy = jax.jit(sample_and_greedy)
            self._sample = jax.jit(sample_step)
            self._greedy = jax.jit(greedy_step)
            self._grad = jax.jit(grad_step)
        else:
            # data-parallel RL (ref train.py:147-178 is single-GPU): batch
            # axes ride the mesh's `data` axis, params/opt replicated, GSPMD
            # psums the grads. Rewards stay per-example host work on the
            # full batch (microseconds/caption, no device sync in between).
            from jax.sharding import NamedSharding, PartitionSpec as P
            data = NamedSharding(mesh, P("data"))
            rep = NamedSharding(mesh, P())
            self._mesh_n = mesh.shape["data"]
            self._data_sharding = data
            self._grad = jax.jit(
                grad_step,
                in_shardings=(rep, data, data, data, data, data),
                out_shardings=(rep, rep))
            if self._fast is None:
                # strict XLA decode partitions under GSPMD — and threefry
                # bits are positional, so sampled trajectories are
                # IDENTICAL to the single-device run (tests/test_parallel)
                self._sample_and_greedy = jax.jit(
                    sample_and_greedy,
                    in_shardings=(rep, data, data, rep), out_shardings=data)
                self._sample = jax.jit(
                    sample_step,
                    in_shardings=(rep, data, data, rep), out_shardings=data)
                self._greedy = jax.jit(
                    greedy_step,
                    in_shardings=(rep, data, data), out_shardings=data)
            else:
                # Pallas kernels don't partition under GSPMD: run the fused
                # decode via shard_map (each shard = the single-chip fast
                # program on its local block, like the sharded beam). The
                # PRNG key is folded with the shard index — a different but
                # equally valid sample stream per shard.
                from vsrcic_tpu.parallel.sharded import _shard_map, _vma_kwargs
                P_ = P

                def local_sg(params, det, grp, rng):
                    rng = jax.random.fold_in(
                        rng, jax.lax.axis_index("data"))
                    return sample_and_greedy(params, det, grp, rng)

                def local_s(params, det, grp, rng):
                    rng = jax.random.fold_in(
                        rng, jax.lax.axis_index("data"))
                    return sample_step(params, det, grp, rng)

                kw = _vma_kwargs()
                self._sample_and_greedy = jax.jit(_shard_map(
                    local_sg, mesh=mesh,
                    in_specs=(P_(), P_("data"), P_("data"), P_()),
                    out_specs=P_("data"), **kw))
                self._sample = jax.jit(_shard_map(
                    local_s, mesh=mesh,
                    in_specs=(P_(), P_("data"), P_("data"), P_()),
                    out_specs=P_("data"), **kw))
                self._greedy = jax.jit(_shard_map(
                    greedy_step, mesh=mesh,
                    in_specs=(P_(), P_("data"), P_("data")),
                    out_specs=P_("data"), **kw))

    def _decode_caps(self, words) -> List[str]:
        caps = self.text_field.decode(np.asarray(words), join_words=False)
        return [dedup_join(c) for c in caps]

    def _decode_multiple(self) -> int:
        """Row-count multiple the decode batch must honor: the fused Pallas
        kernel needs (per-shard) rows % 8 == 0, and a mesh needs the global
        batch divisible by the data axis."""
        mult = 8 if self._fast is not None else 1
        if self.mesh is not None:
            mult *= self._mesh_n
        return mult

    def _pad_decode_batch(self, detections, det_groups):
        """Pad the decode batch up to `_decode_multiple()` by repeating the
        last example (real features — zero-pad rows would hit the
        masked-mean division) and slice decode outputs back to the true
        batch. Reference SCST batch 100 -> padded 104 (fused) / 104*shards.
        """
        b = int(detections.shape[0])
        pad = (-b) % self._decode_multiple()
        if pad == 0:
            return detections, det_groups, b
        rep = lambda a: jnp.concatenate(
            [a, jnp.repeat(a[-1:], pad, axis=0)], axis=0)
        return rep(detections), rep(det_groups), b

    def epoch_baseline_caps(self, detections, det_groups) -> List[str]:
        """Greedy baseline captions for one batch with the current (epoch-
        start) params — reference train.py:122-138."""
        det_p, grp_p, b = self._pad_decode_batch(jnp.asarray(detections),
                                                 jnp.asarray(det_groups))
        base_words, _ = self._greedy(self.state.params, det_p, grp_p)
        return self._decode_caps(base_words[:b])

    def rewards(self, sampled_caps: List[str], baseline_caps: List[str],
                gt_caps: List[str]) -> np.ndarray:
        gts = ptb_tokenize({i: [g] for i, g in enumerate(gt_caps)})
        gen = ptb_tokenize({i: [c] for i, c in enumerate(sampled_caps)})
        base = ptb_tokenize({i: [c] for i, c in enumerate(baseline_caps)})
        if self.native_cider is not None:
            # C++ scorer with the df table resident (1e-12-equal to the
            # Python pair path; tests/test_cider_native.py)
            r, rb = self.native_cider.score_pair(
                [gts[i][0] for i in range(len(gt_caps))],
                [gen[i][0] for i in range(len(gt_caps))],
                [base[i][0] for i in range(len(gt_caps))])
            return (r - rb).astype(np.float32)
        # one ref-cook for both decodes (bit-identical to two
        # compute_score calls; ~45% of the per-step host reward time)
        r, rb = self.cider.compute_score_pair(gts, gen, base)
        return (r - rb).astype(np.float32)

    def step(self, detections, det_groups, gt_caps: List[str], rng,
             baseline_caps: List[str] = None) -> Tuple[float, float]:
        detections = jnp.asarray(detections)
        det_groups = jnp.asarray(det_groups)
        det_p, grp_p, b = self._pad_decode_batch(detections, det_groups)
        if baseline_caps is not None:
            (words, gates), _ = self._sample(self.state.params, det_p,
                                             grp_p, rng)
            baseline = baseline_caps
        else:
            if self.baseline == "epoch":
                raise ValueError("baseline='epoch' requires baseline_caps "
                                 "(from epoch_baseline_caps at epoch start)")
            ((words, gates), _), base_words = self._sample_and_greedy(
                self.state.params, det_p, grp_p, rng)
            baseline = self._decode_caps(base_words[:b])
        words = words[:b]
        gates = gates[:b]
        sampled = self._decode_caps(words)
        adv = self.rewards(sampled, baseline, gt_caps)
        g_det, g_grp, g_words, g_gates, g_adv = self._pad_grad_batch(
            detections, det_groups, words, gates, adv)
        self.state, loss = self._grad(self.state, g_det, g_grp, g_words,
                                      g_gates, g_adv)
        return float(loss), float(np.mean(adv))

    def _pad_grad_batch(self, detections, det_groups, words, gates, adv):
        """Mesh grad step: pad the batch to a data-axis multiple with
        repeated rows whose advantage is 0 (their per-seq loss term
        vanishes), and rescale the real advantages by padded/true batch so
        the padded-batch mean equals the true-batch mean EXACTLY (advantage
        enters the loss linearly) — same estimator, any shard count."""
        b = len(adv)
        if self.mesh is None:
            return (detections, det_groups, words, gates,
                    jnp.asarray(adv))
        pad = (-b) % self._mesh_n
        if pad:
            rep = lambda a: jnp.concatenate(
                [a, jnp.repeat(a[-1:], pad, axis=0)], axis=0)
            adv = np.concatenate([adv * ((b + pad) / b),
                                  np.zeros(pad, adv.dtype)])
            detections, det_groups, words, gates = (
                rep(detections), rep(det_groups), rep(words), rep(gates))
        # decode outputs come back sliced/committed with other shardings;
        # jit with explicit in_shardings refuses to silently reshard
        out = jax.device_put(
            (detections, det_groups, words, gates,
             jnp.asarray(np.asarray(adv).astype(np.float32))),
            self._data_sharding)
        return out
