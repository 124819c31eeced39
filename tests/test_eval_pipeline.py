"""End-to-end eval composition on synthetic data (reference config #1 shape).

Exercises: entities -> fields -> DictionaryDataset batching -> verb-group
extraction -> batched constrained planner decode -> batched Sinkhorn +
Hungarian rounding -> rank merge -> feature permutation -> joint beam search
-> decode -> metrics. All on the CPU mesh with tiny dims.
"""
import numpy as np
import pytest

# heavyweight (~55s on a 1-core host) — excluded from the smoke tier,
# run via the full matrix: `python -m pytest tests/`
pytestmark = pytest.mark.slow

import jax

from vsrcic_tpu.data import (
    COCOControlSetField_Verb, DataLoader, DictionaryDataset,
    ImageDetectionsField, RawField, SyntheticCOCO)
from vsrcic_tpu.metrics import Bleu, Cider, Rouge
from vsrcic_tpu.models.api import ControllableCaptioner
from vsrcic_tpu.models.captioner import CaptionerConfig
from vsrcic_tpu.models.s_ssp import SSPConfig, init_ssp_params
from vsrcic_tpu.models.sinkhorn import SinkhornConfig, init_sinkhorn_params
from vsrcic_tpu.pipelines import CaptionJob, EvalPipeline
from vsrcic_tpu.text import TextField, dedup_join, ptb_tokenize

FEAT = 64  # small det features for CPU speed


@pytest.fixture(scope="module")
def world():
    syn = SyntheticCOCO(n_images=6, n_val=2, n_test=4, feat_dim=FEAT, seed=0)
    train, _, test = syn.sample_splits
    tf = TextField(fix_length=20)
    tf.build_vocab([e.text for e in train + test], min_freq=1)

    cfg = CaptionerConfig(seq_len=20, vocab_size=len(tf.vocab),
                          bos_idx=tf.bos_idx, det_feat_size=FEAT,
                          input_encoding_size=24, rnn_size=16, att_size=8)
    captioner = ControllableCaptioner(
        cfg, key=jax.random.PRNGKey(0),
        verb_2_vob_all=syn.verb_2_vob_all(tf))
    ssp_cfg = SSPConfig(hidden_size=32, embed_size=32)
    ssp_params = init_ssp_params(jax.random.PRNGKey(1), ssp_cfg)
    # vis slice must match the world's det feature width (the 2352-d
    # reference layout is txt 300 | vis 2048 | pos 4; here vis=FEAT)
    kcfg = SinkhornConfig(vis_dim=FEAT)
    kparams = init_sinkhorn_params(jax.random.PRNGKey(2), kcfg)
    return syn, tf, captioner, ssp_cfg, ssp_params, kcfg, kparams


def test_full_eval_pipeline(world):
    syn, tf, captioner, ssp_cfg, ssp_params, kcfg, kparams = world
    _, _, test = syn.sample_splits

    image_field = ImageDetectionsField(syn.store, max_detections=20)
    det_field = COCOControlSetField_Verb(
        syn.store, classes_path=syn.classes, img_shapes_path=syn.img_shapes,
        precomp_glove_path=syn.vectors, verb_idx_path=syn.verb_2_idx,
        idx_vs_path=syn.idx_2_vs_v, cap_classes_path=syn.cap_2_classes_v,
        cap_verb_path=syn.cap_2_verb_v, vocab_path=tf.vocab.itos,
        idx_2_verb_og_path=syn.idx_2_v_og, verb_vob_path={},
        fix_length=10, max_detections=5)

    ds = DictionaryDataset(test, {"image": image_field,
                                  "detection": det_field,
                                  "text": RawField()}, "image")
    loader = DataLoader(ds, batch_size=4)
    pipe = EvalPipeline(captioner, ssp_params, ssp_cfg, kparams, kcfg,
                        eos_word=tf.eos_idx, beam_size=3)

    predictions, gt_captions = [], []
    for keys, values in loader:
        detections, img_ids = keys
        det_per_job, jobs = [], []
        for i in range(detections.shape[0]):
            for out, cap in zip(values["detection"][i], values["text"][i]):
                (word, vis, pos, vis_all, seq_v, seq_sr, cv, gt_v, gt_sr,
                 idx, vl) = out
                jobs.append(CaptionJob(
                    seqs_vis=vis, seqs_txt=word, seqs_pos=pos,
                    seqs_all=vis_all, control_verb=cv, det_seqs_v=seq_v,
                    det_seqs_sr=seq_sr, verb_list=vl))
                det_per_job.append(detections[i])
                gt_captions.append(cap)
        words = pipe.run_batch(np.stack(det_per_job), jobs)
        predictions.extend(list(words))

    assert len(predictions) == len(gt_captions) == 4
    gen, gts = {}, {}
    for i, (p, g) in enumerate(zip(predictions, gt_captions)):
        gen[i] = [dedup_join(tf.decode(p, join_words=False))]
        gts[i] = [g]
    gts_t = ptb_tokenize(gts)
    gen_t = ptb_tokenize(gen)
    bleu, _ = Bleu(4).compute_score(gts_t, gen_t)
    rouge, _ = Rouge().compute_score(gts_t, gen_t)
    cider, _ = Cider().compute_score(gts_t, gen_t)
    assert all(np.isfinite(b) for b in bleu)
    assert np.isfinite(rouge) and np.isfinite(cider)


def test_pipeline_with_shared_sr_regions(world):
    """Two regions with the same SR -> Sinkhorn + Hungarian path exercised."""
    syn, tf, captioner, ssp_cfg, ssp_params, kcfg, kparams = world
    rng = np.random.RandomState(0)
    L, M = 10, 5
    job = CaptionJob(
        seqs_vis=rng.rand(L, FEAT).astype(np.float32),
        seqs_txt=rng.rand(L, 300).astype(np.float32),
        seqs_pos=rng.rand(L, 4).astype(np.float32),
        seqs_all=rng.rand(L, M, FEAT).astype(np.float32),
        control_verb=np.array([3.0, 0, 0, 0, 0, 0, 0, 0]),
        det_seqs_v=np.zeros((L, 8)),
        det_seqs_sr=np.zeros((L, 8)),
        verb_list=np.full((L, 1), -1.0))
    # slots 0,1 share SR 2 under verb 3; slot 2 has SR 7
    job.det_seqs_v[0, 0] = job.det_seqs_v[1, 0] = job.det_seqs_v[2, 0] = 3.0
    job.det_seqs_sr[0, 0] = 2.0
    job.det_seqs_sr[1, 0] = 2.0
    job.det_seqs_sr[2, 0] = 7.0

    # the sinkhorn net is config-dim-driven (vis_dim=FEAT in the fixture),
    # so the reduced-width world needs no 2048 padding anymore
    pipe = EvalPipeline(captioner, ssp_params, ssp_cfg, kparams, kcfg,
                        eos_word=tf.eos_idx, beam_size=2)
    recons, vls = pipe.plan_batch([job])
    # all three region groups must appear (permuted) in the recons
    assert (np.sum(recons[0], (1, 2)) != 0).sum() == L  # tail filled w/ last
    assert vls.shape == (1, L)


def test_eval_pipeline_gt_verb_mode(world):
    """--gt mode: verb slots carry caption-vocab ids, substituted one-hot."""
    syn, tf, captioner, ssp_cfg, ssp_params, kcfg, kparams = world
    from vsrcic_tpu.models.api import ControllableCaptioner
    cap_gt = ControllableCaptioner(captioner.cfg, params=captioner.params,
                                   verb_2_vob_all=syn.verb_2_vob_all(tf))
    rng = np.random.RandomState(1)
    L, M = 10, 5
    vocab_verb_id = 7  # some caption-vocab id
    job = CaptionJob(
        seqs_vis=rng.rand(L, FEAT).astype(np.float32),
        seqs_txt=rng.rand(L, 300).astype(np.float32),
        seqs_pos=rng.rand(L, 4).astype(np.float32),
        seqs_all=rng.rand(L, M, FEAT).astype(np.float32),
        control_verb=np.array([2.0, 0, 0, 0, 0, 0, 0, 0]),
        det_seqs_v=np.zeros((L, 8)),
        det_seqs_sr=np.zeros((L, 8)),
        verb_list=np.full((L, 1), -1.0))
    job.det_seqs_v[0, 0] = 2.0
    job.det_seqs_sr[0, 0] = 25.0  # V role
    job.verb_list[0, 0] = vocab_verb_id
    pipe = EvalPipeline(cap_gt, ssp_params, ssp_cfg, kparams, kcfg,
                        eos_word=tf.eos_idx, beam_size=2, gt=True)
    dets = rng.rand(1, 20, FEAT).astype(np.float32)
    words = pipe.run_batch(dets, [job])
    assert words.shape == (1, 20)
    # the forced verb id must appear in the decoded sequence (substitution
    # makes it the only choice at its slot with the gate forced to shift)
    assert vocab_verb_id in list(words[0])


def test_pipeline_recons_layout_emission(world):
    """With the fast-path captioner (fused attention + bf16 tables, interpret
    Pallas on CPU) the pipeline emits recons pre-cast/pre-padded into the
    beam's statics-table layout; tokens must equal a pipeline whose layout
    emission is disabled (beam does the cast+pad itself)."""
    syn, tf, _, ssp_cfg, ssp_params, kcfg, kparams = world
    import jax.numpy as jnp
    cfg = CaptionerConfig(seq_len=20, vocab_size=len(tf.vocab),
                          bos_idx=tf.bos_idx, det_feat_size=FEAT,
                          input_encoding_size=24, rnn_size=16, att_size=8)
    fast = ControllableCaptioner(
        cfg, key=jax.random.PRNGKey(0),
        verb_2_vob_all=syn.verb_2_vob_all(tf),
        use_fused_attention=True, table_dtype=jnp.bfloat16,
        pallas_interpret=True)

    rng = np.random.RandomState(2)
    L, M = 10, 5
    jobs = []
    for p in range(3):
        job = CaptionJob(
            seqs_vis=rng.rand(L, 2048).astype(np.float32),
            seqs_txt=rng.rand(L, 300).astype(np.float32),
            seqs_pos=rng.rand(L, 4).astype(np.float32),
            seqs_all=rng.rand(L, M, FEAT).astype(np.float32),
            control_verb=np.array([3.0, 0, 0, 0, 0, 0, 0, 0]),
            det_seqs_v=np.zeros((L, 8)), det_seqs_sr=np.zeros((L, 8)),
            verb_list=np.full((L, 1), -1.0))
        job.det_seqs_v[0, 0] = job.det_seqs_v[1, 0] = 3.0
        job.det_seqs_sr[0, 0] = 2.0
        job.det_seqs_sr[1, 0] = 7.0
        jobs.append(job)
    dets = rng.rand(len(jobs), 6, FEAT).astype(np.float32)

    pipe_a = EvalPipeline(fast, ssp_params, ssp_cfg, kparams, kcfg,
                          eos_word=tf.eos_idx, beam_size=2)
    assert pipe_a._recons_dtype is not None and pipe_a._recons_m_pad
    words_a = pipe_a.run_batch(dets, jobs)

    pipe_b = EvalPipeline(fast, ssp_params, ssp_cfg, kparams, kcfg,
                          eos_word=tf.eos_idx, beam_size=2)
    pipe_b._recons_dtype = None
    pipe_b._recons_m_pad = None
    words_b = pipe_b.run_batch(dets, jobs)
    np.testing.assert_array_equal(words_a, words_b)


def test_run_stream_matches_run_batch(world):
    """The 1-ahead software-pipelined stream must produce byte-identical
    tokens to sequential run_batch on every batch, including a batch with
    no verb groups (plan_dispatch's ga=None early-out) and the final
    drain."""
    syn, tf, captioner, ssp_cfg, ssp_params, kcfg, kparams = world
    rng = np.random.RandomState(5)
    L, M = 10, 5

    def mk_job(with_groups, seed_v):
        job = CaptionJob(
            seqs_vis=rng.rand(L, FEAT).astype(np.float32),
            seqs_txt=rng.rand(L, 300).astype(np.float32),
            seqs_pos=rng.rand(L, 4).astype(np.float32),
            seqs_all=rng.rand(L, M, FEAT).astype(np.float32),
            control_verb=np.zeros(8),
            det_seqs_v=np.zeros((L, 8)),
            det_seqs_sr=np.zeros((L, 8)),
            verb_list=np.full((L, 1), -1.0))
        if with_groups:
            job.control_verb[0] = seed_v
            job.det_seqs_v[0:3, 0] = seed_v
            job.det_seqs_sr[0, 0] = 2.0   # shared SR pair -> Sinkhorn
            job.det_seqs_sr[1, 0] = 2.0
            job.det_seqs_sr[2, 0] = 7.0
        return job

    batches = []
    for b, grouped in enumerate([True, False, True]):
        jobs = [mk_job(grouped, 3.0 + b) for _ in range(2)]
        dets = rng.rand(len(jobs), 6, FEAT).astype(np.float32)
        batches.append((dets, jobs))

    pipe = EvalPipeline(captioner, ssp_params, ssp_cfg, kparams, kcfg,
                        eos_word=tf.eos_idx, beam_size=2)
    seq_words = [pipe.run_batch(d, j) for d, j in batches]
    stream_words = list(pipe.run_stream(iter(batches)))
    assert len(stream_words) == len(seq_words)
    for a, b in zip(stream_words, seq_words):
        np.testing.assert_array_equal(a, b)

    # empty stream: yields nothing
    assert list(pipe.run_stream([])) == []


def test_field_built_multi_verb_job_takes_merge_branch(world):
    """A two-verb synthetic caption, processed by the REAL eval field, must
    extract as TWO verb groups for one job — the plan assembly's multi-verb
    verb_rank_merge branch (eval_pipeline.py 'ng > 1') — and the vectorized
    rank assembly must still match the loop oracle on that batch."""
    from vsrcic_tpu.pipelines.sr_groups import extract_verb_groups_batch

    syn, tf, captioner, ssp_cfg, ssp_params, kcfg, kparams = world
    train, val, test = syn.sample_splits
    two_verb_caps = {cap for caps in syn.cap_2_verb.values()
                     for cap, vs in caps.items() if len(vs) >= 2}
    multi = [e for e in train + val + test if e.text in two_verb_caps]
    assert multi, "synthetic world lost its multi-verb captions"
    ex = multi[0]

    det_field = COCOControlSetField_Verb(
        syn.store, classes_path=syn.classes, img_shapes_path=syn.img_shapes,
        precomp_glove_path=syn.vectors, verb_idx_path=syn.verb_2_idx,
        idx_vs_path=syn.idx_2_vs_v, cap_classes_path=syn.cap_2_classes_v,
        cap_verb_path=syn.cap_2_verb_v, vocab_path=tf.vocab.itos,
        idx_2_verb_og_path=syn.idx_2_v_og, verb_vob_path={},
        fix_length=10, max_detections=5)
    out = det_field.preprocess(((ex.image, ex.text), None))
    (word, vis, pos, vis_all, seq_v, seq_sr, cv, gt_v, gt_sr, idx, vl) = out
    groups, owners = extract_verb_groups_batch(
        np.asarray(cv)[None], np.asarray(seq_v)[None],
        np.asarray(seq_sr)[None])
    assert len(groups) == 2 and owners == [0, 0], (len(groups), owners)

    job = CaptionJob(seqs_vis=vis, seqs_txt=word, seqs_pos=pos,
                     seqs_all=vis_all, control_verb=cv, det_seqs_v=seq_v,
                     det_seqs_sr=seq_sr, verb_list=vl)
    pipe = EvalPipeline(captioner, ssp_params, ssp_cfg, kparams, kcfg,
                        eos_word=tf.eos_idx, beam_size=2)
    r_vec = pipe.plan_rank_batch([job])
    r_loop = pipe.plan_rank_batch_loop([job])
    for a, b in zip(r_vec, r_loop):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
