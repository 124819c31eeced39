"""Trainers for the two SSP planners (S-level sorter, R-level Sinkhorn).

S-SSP (ref coco_scripts/train_region_sort.py): per-batch (verb, det_sr,
gt_sr) groups — extracted host-side by pipelines.sr_groups instead of the
reference's inline Python grid scan — fed to the label-smoothed KLDiv loss;
Adam with the manual 0.6^((e-3)//3+1) decay, stop at epoch 20.

Sinkhorn (ref coco_scripts/train_sinkhorn.py): for every (verb, SR) with >1
region, MSE(tr_locs @ P_soft, gt_locs) where gt comes from the idx_list
permutation; the reference runs SinkhornNet once per pair — here all pairs of
a batch run as ONE batched device call.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from vsrcic_tpu.models.s_ssp import SSPConfig, ssp_forward_loss
from vsrcic_tpu.models.sinkhorn import SinkhornConfig, sinkhorn_net_apply
from vsrcic_tpu.pipelines.sr_groups import extract_verb_groups
from vsrcic_tpu.train.common import (
    TrainState, adam, apply_grads, init_train_state, set_learning_rate)


class SSPTrainer:
    def __init__(self, cfg: SSPConfig, params, lr: float = 1e-4, mesh=None):
        """mesh: data-parallel over the group axis (GSPMD). Group counts
        are data-dependent per batch, so non-divisible batches are padded
        with weight-0 rows: with dropout off the loss EXACTLY equals the
        unpadded single-device value (row_weights in ssp_forward_loss;
        tests/test_parallel.py); with dropout active the padded shape draws
        a different mask, so runs are equivalent-in-distribution, not
        bit-equal (training-time stochasticity either way)."""
        self.cfg = cfg
        self.tx = adam(lr)
        self.state = init_train_state(params, self.tx)
        self.mesh = mesh

        def train_step(state: TrainState, verbs, det_sr, gt_sr, rng, row_w):
            def loss_fn(p):
                return ssp_forward_loss(p, cfg, verbs, det_sr, gt_sr,
                                        rng=rng, row_weights=row_w)
            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return apply_grads(self.tx, state, grads), loss

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            data = NamedSharding(mesh, P("data"))
            rep = NamedSharding(mesh, P())
            self._train_step = jax.jit(
                train_step, in_shardings=(rep, data, data, data, rep, data),
                out_shardings=(rep, rep))
        else:
            self._train_step = jax.jit(train_step)

    def set_lr(self, lr: float):
        self.state = TrainState(self.state.params,
                                set_learning_rate(self.state.opt_state, lr),
                                self.state.step)

    @staticmethod
    def batch_from_grids(control_verb, det_seqs_v, det_seqs_sr, gt_seqs_v,
                         gt_seqs_sr):
        """Nested per-image/per-caption grids -> stacked planner batch.

        Replaces the reference's in-loop tensor concatenation
        (train_region_sort.py:134-179); accepts the DictionaryDataset values
        layout (list per image of list per caption of grids).
        """
        verbs, det_list, gt_list = [], [], []
        for img_cv, img_v, img_sr, img_gv, img_gsr in zip(
                control_verb, det_seqs_v, det_seqs_sr, gt_seqs_v, gt_seqs_sr):
            for cv, v, sr, gv, gsr in zip(img_cv, img_v, img_sr, img_gv,
                                          img_gsr):
                for g in extract_verb_groups(cv, v, sr, gv, gsr):
                    verbs.append([g.verb])
                    det_list.append(g.det_sr_seq)
                    gt_list.append(g.gt_sr_seq)
        if not verbs:
            return None
        return (np.asarray(verbs), np.stack(det_list), np.stack(gt_list))

    def step(self, verbs, det_sr, gt_sr, rng) -> float:
        row_w = np.ones((np.asarray(verbs).shape[0],), np.float32)
        if self.mesh is not None:
            from vsrcic_tpu.parallel.mesh import shard_batch
            verbs, det_sr, gt_sr, row_w = shard_batch(
                (verbs, det_sr, gt_sr, row_w), self.mesh)
        self.state, loss = self._train_step(
            self.state, jnp.asarray(verbs), jnp.asarray(det_sr),
            jnp.asarray(gt_sr), rng, jnp.asarray(row_w))
        return float(loss)


def sinkhorn_pairs_from_grids(control_verb, det_seqs_v, det_seqs_sr,
                              idx_list, seqs_vis, seqs_txt, seqs_pos,
                              sinkhorn_len: int = 10):
    """Build (inputs (N, L, 2352), tr_locs (N, L), gt_locs (N, L)) training
    pairs for every (verb, SR) needing re-ranking (ref train_sinkhorn.py
    :144-205). Nested DictionaryDataset values layout accepted."""
    inputs, tr_all, gt_all = [], [], []
    for img in zip(control_verb, det_seqs_v, det_seqs_sr, idx_list, seqs_vis,
                   seqs_txt, seqs_pos):
        for cv, v, sr, il, vis, txt, pos in zip(*img):
            perm_feats = np.concatenate([vis, txt, pos], -1)
            il = np.asarray(il).squeeze(-1)
            for g in extract_verb_groups(cv, v, sr):
                for sr_val in g.need_re_rank:
                    locs = g.sr_find[sr_val]
                    x = np.zeros((sinkhorn_len, perm_feats.shape[-1]),
                                 np.float32)
                    tr_locs = np.full(sinkhorn_len, 10.0, np.float32)
                    gt_locs = np.full(sinkhorn_len, 10.0, np.float32)
                    for j, loc in enumerate(locs):
                        if j >= sinkhorn_len:
                            continue
                        tr_locs[j] = loc
                        gt_locs[j] = il[loc]
                        x[j] = perm_feats[loc]
                    # target = rank positions from idx_list order (ref :198-205)
                    change = np.argsort(gt_locs)
                    gt_locs_ = np.full(sinkhorn_len, 10.0, np.float32)
                    for j in range(sinkhorn_len):
                        if j < len(locs):
                            gt_locs_[j] = change[j]
                    inputs.append(x)
                    tr_all.append(tr_locs)
                    gt_all.append(gt_locs_)
    if not inputs:
        return None
    return np.stack(inputs), np.stack(tr_all), np.stack(gt_all)


class SinkhornTrainer:
    def __init__(self, cfg: SinkhornConfig, params, lr: float = 1e-4,
                 loss_normalization: str = "images", mesh=None):
        """loss_normalization: 'images' (COCO script: /batch_size,
        train_sinkhorn.py:211) or 'pairs' (Flickr script: /pair count,
        train_sinkhorn_flickr.py:209-210)."""
        self.cfg = cfg
        self.tx = adam(lr)
        self.state = init_train_state(params, self.tx)
        self.loss_normalization = loss_normalization

        def train_step(state: TrainState, inputs, tr_locs, gt_locs, denom):
            def loss_fn(p):
                P = sinkhorn_net_apply(p, cfg, inputs)      # (N, L, L)
                resort = jnp.einsum("nl,nlm->nm", tr_locs, P)
                per_pair = jnp.mean((resort - gt_locs) ** 2, -1)
                return jnp.sum(per_pair) / denom
            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return apply_grads(self.tx, state, grads), loss

        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            data = NamedSharding(mesh, P("data"))
            rep = NamedSharding(mesh, P())
            self._train_step = jax.jit(
                train_step, in_shardings=(rep, data, data, data, rep),
                out_shardings=(rep, rep))
        else:
            self._train_step = jax.jit(train_step)

    def set_lr(self, lr: float):
        self.state = TrainState(self.state.params,
                                set_learning_rate(self.state.opt_state, lr),
                                self.state.step)

    def step(self, inputs, tr_locs, gt_locs, n_images: int) -> float:
        denom = float(n_images if self.loss_normalization == "images"
                      else len(inputs))
        if self.mesh is not None:
            # pair counts are data-dependent: shard_batch zero-pads to the
            # mesh — tr_locs 0 makes resort 0 and gt_locs 0 makes the
            # padded (resort - gt)^2 exactly 0, and denom is explicit, so
            # the padded loss EQUALS the unpadded one
            from vsrcic_tpu.parallel.mesh import shard_batch
            inputs, tr_locs, gt_locs = shard_batch(
                (inputs, tr_locs, gt_locs), self.mesh)
        self.state, loss = self._train_step(
            self.state, jnp.asarray(inputs), jnp.asarray(tr_locs),
            jnp.asarray(gt_locs), jnp.asarray(denom))
        return float(loss)
