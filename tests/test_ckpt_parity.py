"""Checkpoint-parity closure: reference-torch-written .pth files -> our
import path -> our eval pipeline == the reference eval loop, token for token.

The reference's value proposition is "released checkpoint -> eval metric
table" (reference coco_scripts/eval_coco.py). Real COCO data/checkpoints are
absent here, so this test closes the loop synthetically:

  1. build the actual reference torch models (tiny captioner, full-size
     S_SSP/SinkhornNet) and torch.save() them in the reference's own
     checkpoint formats (training dict with 'state_dict' inside for the
     captioner, bare state dicts for the planners — ref train.py:221-230,
     train_region_sort.py:42-54);
  2. import them via import_torch_state_dict (the same function the CLIs
     use for released .pth files);
  3. run the reference eval composition (eval_coco.py:116-255 staged on CPU
     torch: per-verb constrained S_SSP generate -> SinkhornNet + Hungarian ->
     verb_rank_merge -> feature permutation -> beam_search_v) and our
     EvalPipeline.run_batch on the same inputs;
  4. assert the output captions are token-identical.

munkres isn't installed; the reference's `Munkres().compute(make_cost_matrix
(mx))` is a max-profit optimal assignment, staged here with scipy's solver
(identical result — profit matrices are random floats, so the optimum is
unique).
"""
import importlib.util

import numpy as np
import pytest

# heavyweight (~87s on a 1-core host) — excluded from the smoke tier,
# run via the full matrix: `python -m pytest tests/`
pytestmark = pytest.mark.slow
import torch

import jax.numpy as jnp

from vsrcic_tpu.models.api import ControllableCaptioner
from vsrcic_tpu.models.captioner import CaptionerConfig
from vsrcic_tpu.models.s_ssp import SSPConfig
from vsrcic_tpu.models.sinkhorn import SinkhornConfig
from vsrcic_tpu.pipelines import CaptionJob, EvalPipeline
from vsrcic_tpu.utils.torch_import import import_torch_state_dict

from reference_loader import (load_reference_captioner, load_reference_ssp,
                              load_reference_sinkhorn)

_spec = importlib.util.spec_from_file_location(
    "ref_tools", "/root/reference/utils/tools.py")
ref_tools = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ref_tools)

V, D, E, R, A = 30, 2048, 16, 16, 8   # vocab, det_feat(=sinkhorn vis), ...
T = 12                                # seq_len
L, M = 10, 5                          # fixed_len, max_det per group
BOS, EOS = 2, 3
BEAM = 3
VERB_TABLE = {"5": [7, 11], "9": [13], "12": []}


@pytest.fixture(scope="module")
def ckpts(tmp_path_factory):
    root = tmp_path_factory.mktemp("ckpts")
    torch.manual_seed(0)
    cap = load_reference_captioner(
        tmp_path_factory.mktemp("refcap"), verb_2_vob_all=VERB_TABLE,
        seq_len=T, vocab_size=V, bos_idx=BOS, det_feat_size=D,
        input_encoding_size=E, rnn_size=R, att_size=A)
    ssp = load_reference_ssp(dataset="coco")
    sink = load_reference_sinkhorn(N=10, n_iters=20, tau=0.1)

    cap_pth = str(root / "ours_coco_rl.pth")
    torch.save({"epoch": 3, "val_cider": 0.5, "patience": 0,
                "opt": {"batch_size": 16},
                "state_dict": cap.state_dict()}, cap_pth)
    ssp_pth = str(root / "model-tr.pth")
    torch.save(ssp.state_dict(), ssp_pth)
    sink_pth = str(root / "model-sh.pth")
    torch.save(sink.state_dict(), sink_pth)
    return dict(cap=cap, ssp=ssp, sink=sink, cap_pth=cap_pth,
                ssp_pth=ssp_pth, sink_pth=sink_pth)


def make_jobs(seed=0, verb_offset=0):
    """Per-(image,caption) control inputs shaped like D9 field outputs.

    Two images x two captions. Verb ids are planner codes (verb_2_idx+1);
    they appear in control_verb, in the det_seqs_v grid, and (for the V=25
    slot) in verb_list. SR 2 is shared by two slots under verb 5 -> exercises
    the Sinkhorn + Hungarian re-rank path; job 1 carries two verbs ->
    exercises verb_rank_merge. verb_offset: Flickr encodes occurrence as
    +10000*occ on the planner codes (ref field.py:844-845) — applied to the
    grid/control codes (NOT the captioner verb_list, which stays plain,
    ref field.py:1199-1201).
    """
    rng = np.random.RandomState(seed)
    jobs, dets = [], []
    for p in range(4):
        img = p // 2
        rng_img = np.random.RandomState(100 + img)
        det = np.zeros((20, D), np.float32)
        det[:12] = rng_img.rand(12, D)
        dets.append(det)

        control_verb = np.zeros(8)
        seq_v = np.zeros((L, 8))
        seq_sr = np.zeros((L, 8))
        verb_list = np.full((L, 1), -1.0)
        n_used = 6
        if p % 2 == 0:
            control_verb[0] = 5.0
            # slots 0,1 share SR 2 (re-rank); slot 2 SR 7; slot 3 SR 25 (V)
            seq_v[0, 0] = seq_v[1, 0] = seq_v[2, 0] = seq_v[3, 0] = 5.0
            seq_sr[0, 0], seq_sr[1, 0] = 2.0, 2.0
            seq_sr[2, 0] = 7.0
            seq_sr[3, 0] = 25.0
            verb_list[3, 0] = 5.0
        else:
            v2_code = 9.0 + verb_offset  # flickr: 2nd occurrence-style code
            control_verb[0], control_verb[1] = 5.0, v2_code
            seq_v[0, 0] = seq_v[1, 0] = seq_v[2, 0] = 5.0
            seq_sr[0, 0], seq_sr[1, 0], seq_sr[2, 0] = 1.0, 2.0, 25.0
            verb_list[2, 0] = 5.0
            # verb 9 shares slot 1 and adds slots 4,5 (incl. its own V slot)
            seq_v[1, 1] = seq_v[4, 0] = seq_v[5, 0] = v2_code
            seq_sr[1, 1], seq_sr[4, 0], seq_sr[5, 0] = 7.0, 1.0, 25.0
            verb_list[5, 0] = 9.0

        seqs_all = np.zeros((L, M, D), np.float32)
        seqs_all[:n_used] = rng.rand(n_used, M, D)
        jobs.append(CaptionJob(
            seqs_vis=rng.rand(L, D).astype(np.float32),
            seqs_txt=rng.rand(L, 300).astype(np.float32),
            seqs_pos=rng.rand(L, 4).astype(np.float32),
            seqs_all=seqs_all, control_verb=control_verb,
            det_seqs_v=seq_v, det_seqs_sr=seq_sr, verb_list=verb_list))
    return jobs, np.stack(dets)


def _munkres_assign(mx):
    """Stage the reference's munkres usage (eval_coco.py:188-192) with scipy:
    max-profit optimal assignment over the full NxN matrix."""
    from scipy.optimize import linear_sum_assignment
    rows, cols = linear_sum_assignment(-np.asarray(mx))
    return list(zip(rows.tolist(), cols.tolist()))


def reference_eval(cap, ssp, sink, jobs, dets, gt=False):
    """Reference eval composition, staged verbatim from eval_coco.py:127-247
    on CPU torch (per-caption Python loops, batch-1 model calls)."""
    sinkhorn_len, fixed_len = 10, L
    recons_all = np.zeros((len(jobs), L, M, D))
    img_verb_list = np.zeros((len(jobs), L, 1))
    with torch.no_grad():
        for idx, job in enumerate(jobs):
            this_seqs_perm = torch.cat(
                (torch.tensor(job.seqs_vis), torch.tensor(job.seqs_txt),
                 torch.tensor(job.seqs_pos)), -1)
            this_det_seqs_v = torch.tensor(job.det_seqs_v)
            this_det_seqs_sr = torch.tensor(job.det_seqs_sr)
            verb_ranks = []
            for verb in torch.tensor(job.control_verb):
                if verb == 0:
                    break
                verb_det_seqs_sr = this_det_seqs_sr.new_zeros(
                    this_det_seqs_sr.shape[0])
                find_sr = 0
                sr_find = {}
                need_re_rank = set()
                for j, vs in enumerate(this_det_seqs_v):
                    for k, v in enumerate(vs):
                        if verb == v and find_sr < 10:
                            sr = int(this_det_seqs_sr[j][k].item())
                            if sr not in sr_find:
                                sr_find[sr] = [j]
                                verb_det_seqs_sr[find_sr] = \
                                    this_det_seqs_sr[j][k].item()
                                find_sr += 1
                            else:
                                sr_find[sr].append(j)
                                need_re_rank.add(sr)
                if find_sr == 0:
                    continue
                output = ssp.generate(verb.unsqueeze(0),
                                      verb_det_seqs_sr.unsqueeze(0),
                                      mode="not-normal")
                sr_rank = {}
                for sr in need_re_rank:
                    this_sr_perm = torch.zeros(sinkhorn_len,
                                               this_seqs_perm.shape[1])
                    for j, loc in enumerate(sr_find[sr]):
                        this_sr_perm[j, :] = this_seqs_perm[loc]
                    tr_matrix = sink(this_sr_perm.unsqueeze(0))
                    mx = torch.transpose(tr_matrix, 1, 2).squeeze().numpy()
                    ass = _munkres_assign(mx)
                    sr_re = []
                    for idx_ in range(len(sr_find[sr])):
                        for a in ass:
                            if a[0] == idx_:
                                sr_re.append(a[1])
                    sr_idx = np.argsort(np.array(sr_re))
                    output_idx = np.zeros(len(sr_find[sr]))
                    for j, idx_ in enumerate(sr_idx):
                        output_idx[j] = sr_find[sr][idx_]
                    sr_rank[sr] = output_idx
                verb_rank = []
                for sr_ in output[0].squeeze().cpu().numpy():
                    if sr_ == 0:
                        break
                    if len(sr_find[sr_]) != 1:
                        verb_rank += list(sr_rank[sr_])
                    else:
                        verb_rank += sr_find[sr_]
                verb_ranks.append(verb_rank)

            final_rank = verb_ranks[0]
            for j in range(len(verb_ranks) - 1):
                final_rank = ref_tools.verb_rank_merge(final_rank,
                                                       verb_ranks[j + 1])

            perm_matrix = np.zeros((fixed_len, fixed_len))
            for j, rk in enumerate(final_rank):
                if j < fixed_len:
                    perm_matrix[j, int(rk)] = 1
            perm = np.reshape(job.seqs_all, (job.seqs_all.shape[0], -1))
            recons = np.dot(perm_matrix, perm)
            recons = np.reshape(recons, job.seqs_all.shape)
            recons = recons[np.sum(recons, (1, 2)) != 0]
            last = recons.shape[0] - 1
            recons_all[idx, :recons.shape[0]] = recons
            recons_all[idx, last + 1:] = recons[last:last + 1]
            perm_mask = (np.sum(perm_matrix, -1) == 0).astype(int)
            img_verb_list[idx] = (-1 * perm_mask[:, np.newaxis]
                                  + np.dot(perm_matrix, job.verb_list))

        out, _ = cap.beam_search_v(
            (torch.tensor(dets), torch.tensor(recons_all).float(),
             torch.tensor(img_verb_list).squeeze(-1)),
            eos_idxs=[EOS, -1], beam_size=BEAM, out_size=1, gt=gt)
    return out[0].cpu().numpy(), recons_all, img_verb_list.squeeze(-1)


@pytest.mark.parametrize("gt", [False, True])
def test_pth_to_captions_parity(ckpts, gt):
    cfg = CaptionerConfig(seq_len=T, vocab_size=V, bos_idx=BOS,
                          det_feat_size=D, input_encoding_size=E,
                          rnn_size=R, att_size=A)
    cap_params = import_torch_state_dict(ckpts["cap_pth"])
    ssp_params = import_torch_state_dict(ckpts["ssp_pth"])
    sink_params = import_torch_state_dict(ckpts["sink_pth"])
    captioner = ControllableCaptioner(cfg, params=cap_params,
                                      verb_2_vob_all=VERB_TABLE)
    pipe = EvalPipeline(captioner, ssp_params, SSPConfig(dataset="coco"),
                        sink_params, SinkhornConfig(n=10, n_iters=20, tau=0.1),
                        eos_word=EOS, beam_size=BEAM, gt=gt)

    jobs, dets = make_jobs()
    if gt:
        # --gt mode: verb slots carry caption-vocab ids, not planner codes
        for job in jobs:
            job.verb_list[job.verb_list > 0] = 7.0
    ref_words, ref_recons, ref_vl = reference_eval(
        ckpts["cap"], ckpts["ssp"], ckpts["sink"], jobs, dets, gt=gt)

    recons, vls = pipe.plan_batch(jobs)
    np.testing.assert_allclose(recons, ref_recons, rtol=1e-5, atol=1e-6,
                               err_msg="planned region groups differ")
    np.testing.assert_array_equal(vls, ref_vl)

    words = pipe.run_batch(dets, jobs)
    np.testing.assert_array_equal(np.asarray(words), ref_words)


def test_flickr_composition_parity(ckpts, tmp_path):
    """Flickr flavor (eval_flickr.py:120-262): S_SSP(dataset='flickr'),
    verb codes carrying the +10000*occurrence offset through group
    extraction and the planner's %10000 strip."""
    torch.manual_seed(3)
    ssp_f = load_reference_ssp(dataset="flickr")
    ssp_pth = str(tmp_path / "model-tr-flickr.pth")
    torch.save(ssp_f.state_dict(), ssp_pth)

    cfg = CaptionerConfig(seq_len=T, vocab_size=V, bos_idx=BOS,
                          det_feat_size=D, input_encoding_size=E,
                          rnn_size=R, att_size=A)
    captioner = ControllableCaptioner(
        cfg, params=import_torch_state_dict(ckpts["cap_pth"]),
        verb_2_vob_all=VERB_TABLE)
    pipe = EvalPipeline(captioner, import_torch_state_dict(ssp_pth),
                        SSPConfig(dataset="flickr"),
                        import_torch_state_dict(ckpts["sink_pth"]),
                        SinkhornConfig(n=10, n_iters=20, tau=0.1),
                        eos_word=EOS, beam_size=BEAM)

    jobs, dets = make_jobs(seed=4, verb_offset=10000)
    ref_words, ref_recons, ref_vl = reference_eval(
        ckpts["cap"], ssp_f, ckpts["sink"], jobs, dets)
    recons, vls = pipe.plan_batch(jobs)
    np.testing.assert_allclose(recons, ref_recons, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(vls, ref_vl)
    words = pipe.run_batch(dets, jobs)
    np.testing.assert_array_equal(np.asarray(words), ref_words)


def test_import_rejects_nothing_silently(ckpts):
    """The captioner dict unwraps state_dict; planner files import as-is."""
    params = import_torch_state_dict(ckpts["cap_pth"])
    assert "state_dict" not in params          # unwrapped
    assert "lstm_cell_1" in params or len(params) > 3
    ssp = import_torch_state_dict(ckpts["ssp_pth"])
    assert "expander_nn" in ssp
