"""Joint (word x shift-gate) beam search as a single jitted scan.

Re-design of the reference beam engine (models/CaptioningModel.py:116-294):
the reference keeps beam state in Python lists and re-gathers tensors with
`_select_beam` per step on device+host; here the full beam state — recurrent
state, running scores, EOS masks, emitted tokens and per-step logprobs — is a
fixed-shape pytree resident in HBM, advanced by `lax.scan`, with beam
reindexing as `take_along_axis` gathers. The joint expansion scores the
(beam x vocab x gate) product space and top-k's over its flattening, exactly
like the reference's `sort` over `seq_logprob.view(b_s, -1)` (ref :238-255),
including:

  * EOS masking of recorded per-output logprobs via multiplicative seq_masks
    (ref :228-230),
  * the finished-beam freeze that pins scores to word 0 via
    `old_seq_logprob[:, :, 1:] = -999` (ref :231-235) — which, as in the
    reference, only activates when *all* outputs hit their EOS ids,
  * beam/word/gate recovery by floor-division of the flat index (ref :242-255).

`step_fn` is any callable `(state, prev_word, prev_gate, t0) ->
((word_logp, gate_logp), state)` over flattened (batch*beam) leading dim, so
the same engine drives `step` and the verb-substituting `step_v`.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


class BeamResult(NamedTuple):
    words: jnp.ndarray        # (B, K, T) int32, beams sorted by score desc
    gates: jnp.ndarray        # (B, K, T) int32
    word_logps: jnp.ndarray   # (B, K, T)
    gate_logps: jnp.ndarray   # (B, K, T)
    scores: jnp.ndarray       # (B, K)


def _gather_beam(tree, sel, batch, beam, take_along=False):
    """Reindex every (batch*beam, ...) leaf by per-item beam selection sel (B, K).

    Default form: one flat row gather per leaf on the native (batch*beam, ...)
    layout — profiling showed the reshape/take_along_axis form paying physical
    layout copies ({2,0,1} transposes) around each per-leaf gather
    (~0.45 ms/step at batch 1024 x beam 5). The flat global row index stays
    shard-local under shard_map (each shard calls this on its local batch);
    take_along=True restores the take_along_axis form. The knob is a plain
    argument (threaded from ControllableCaptioner, where the
    VSRCIC_BEAM_TAKE_ALONG env var is honored once at construction) — NOT an
    env read here, which under jit would be captured silently at first trace.
    """
    if take_along:
        def g(x):
            xk = x.reshape((batch, beam) + x.shape[1:])
            selx = sel.reshape((batch, beam) + (1,) * (xk.ndim - 2))
            out = jnp.take_along_axis(xk, selx.astype(jnp.int32), axis=1)
            return out.reshape((batch * beam,) + x.shape[1:])
        return jax.tree.map(g, tree)
    rows = (jnp.arange(batch, dtype=jnp.int32)[:, None] * beam
            + sel.astype(jnp.int32)).reshape(-1)        # (batch*beam,)
    return jax.tree.map(lambda x: x[rows], tree)


def beam_search_joint(step_fn: Callable, state: Any, batch: int, beam_size: int,
                      seq_len: int, eos_word: int, eos_gate: int = -1,
                      gather_take_along: bool = False,
                      rec_flat: bool = False) -> BeamResult:
    """Run the joint beam search.

    `state` must already be expanded to leading dim batch*beam_size with all
    beams of an item identical (beam 0 is the live one at t=0).

    rec_flat: record per-step logprobs with ONE flat (beam*vocab) gather per
    side instead of nested take_along_axis over (B, K, V) — and multiply the
    EOS mask on the K selected values after the beam gather rather than on
    the full (B, K, V) block before it (identical operand pairs, so
    bit-exact; see the body note). Threaded from ControllableCaptioner
    (VSRCIC_REC_FLAT honored once at construction), same convention as
    gather_take_along.
    """
    k = beam_size

    def joint_topk(seq_logprob, w, g, frozen=None, t0_mask=None):
        """Top-k over the flattened joint (beam x vocab x gate) space.

        Perf note: hierarchical/word-level reductions of this top-k were
        implemented and MEASURED SLOWER on TPU (flat: 1848 caps/s vs
        word-level: 755 at the reference model size) — XLA fuses the
        broadcast-add + flat top_k into a single pass, while the split
        formulations materialize intermediates. Keep the flat form.
        """
        total = (seq_logprob[:, :, None, None] + w[:, :, :, None]
                 + g[:, :, None, :])
        if frozen is not None:
            # finished-beam freeze (ref :231-235): keep old score at word 0
            vocab = w.shape[-1]
            word_is0 = (jnp.arange(vocab) == 0)[None, None, :, None]
            froz = jnp.where(word_is0, seq_logprob[:, :, None, None], -999.0)
            total = jnp.where(frozen[:, :, None, None], froz, total)
        if t0_mask is not None:
            total = jnp.where(t0_mask, total, -jnp.inf)
        v2 = w.shape[-1] * 2
        flat = total.reshape(batch, k * v2)
        sel_logprob, idx = jax.lax.top_k(flat, k)
        sel_beam = idx // v2
        rem = idx - sel_beam * v2
        word = rem // 2
        gate = rem - word * 2
        return (sel_logprob, sel_beam, word.astype(jnp.int32),
                gate.astype(jnp.int32))

    # ----- t = 0: single live beam ------------------------------------------
    zeros_bk = jnp.zeros((batch * k,), jnp.int32)
    (w_logp, g_logp), state = step_fn(state, zeros_bk, zeros_bk, True)
    vocab = w_logp.shape[-1]
    w = w_logp.reshape(batch, k, vocab)
    g = g_logp.reshape(batch, k, 2)
    beam0 = (jnp.arange(k) == 0)[None, :, None, None]
    seq_logprob, sel_beam, word, gate = joint_topk(
        jnp.zeros((batch, k)), w, g, t0_mask=beam0)
    state = _gather_beam(state, sel_beam, batch, k,
                         take_along=gather_take_along)

    words = jnp.zeros((batch, k, seq_len), jnp.int32).at[:, :, 0].set(word)
    gates = jnp.zeros((batch, k, seq_len), jnp.int32).at[:, :, 0].set(gate)
    rec = lambda o, s, i: jnp.take_along_axis(
        jnp.take_along_axis(o, s[:, :, None], 1), i[:, :, None], 2)[:, :, 0]
    # flat-record form: one gather over the flattened (beam*V) axis picks
    # the K selected logprobs directly — no (B, K, V) row-gather
    # intermediate and no full-block mask multiply
    recf = lambda o, s, i: jnp.take_along_axis(
        o.reshape(batch, -1), s * o.shape[-1] + i, 1)
    if rec_flat:
        w_lp0 = recf(w, sel_beam, word)
        g_lp0 = recf(g, sel_beam, gate)
    else:
        w_lp0 = rec(w, sel_beam, word)
        g_lp0 = rec(g, sel_beam, gate)
    word_logps = jnp.zeros((batch, k, seq_len)).at[:, :, 0].set(w_lp0)
    gate_logps = jnp.zeros((batch, k, seq_len)).at[:, :, 0].set(g_lp0)
    mask_w = jnp.ones((batch, k))
    mask_g = jnp.ones((batch, k))

    # ----- t >= 1 ------------------------------------------------------------
    def body(carry, t):
        (state, seq_logprob, mask_w, mask_g, word, gate,
         words, gates, word_logps, gate_logps) = carry
        (w_logp, g_logp), state = step_fn(
            state, word.reshape(-1), gate.reshape(-1), False)
        w = w_logp.reshape(batch, k, vocab)
        g = g_logp.reshape(batch, k, 2)

        # EOS masks from previously selected outputs (ref :228-229)
        mask_w = mask_w * (word != eos_word)
        mask_g = mask_g * (gate != eos_gate)
        if not rec_flat:
            w_rec = w * mask_w[:, :, None]
            g_rec = g * mask_g[:, :, None]

        # finished-beam freeze (ref :231-235): keep old score at word 0 only
        mask_full = jnp.clip(mask_w + mask_g, 0.0, 1.0)
        seq_logprob, sel_beam, word, gate = joint_topk(
            seq_logprob, w, g, frozen=(mask_full == 0.0))

        state = _gather_beam(state, sel_beam, batch, k,
                         take_along=gather_take_along)
        g2 = lambda a: jnp.take_along_axis(a, sel_beam, axis=1)
        g3 = lambda a: jnp.take_along_axis(a, sel_beam[:, :, None], axis=1)
        mask_w, mask_g = g2(mask_w), g2(mask_g)
        words = g3(words).at[:, :, t].set(word)
        gates = g3(gates).at[:, :, t].set(gate)
        # NB: the reference appends per-step logprobs WITHOUT re-gathering the
        # history along the selected beams (ref :273 — only `outputs` go
        # through _select_beam), so recorded logps track beam *slots*, not
        # ancestries. Reproduced for parity.
        if rec_flat:
            # (w * mask)[b, sel, word] == w[b, sel, word] * mask[b, sel]:
            # the masks gathered along sel_beam above are exactly the
            # factors the (B, K, V) pre-multiply would have applied
            word_logps = word_logps.at[:, :, t].set(
                recf(w, sel_beam, word) * mask_w)
            gate_logps = gate_logps.at[:, :, t].set(
                recf(g, sel_beam, gate) * mask_g)
        else:
            word_logps = word_logps.at[:, :, t].set(rec(w_rec, sel_beam, word))
            gate_logps = gate_logps.at[:, :, t].set(rec(g_rec, sel_beam, gate))
        return (state, seq_logprob, mask_w, mask_g, word, gate,
                words, gates, word_logps, gate_logps), None

    carry = (state, seq_logprob, mask_w, mask_g, word, gate,
             words, gates, word_logps, gate_logps)
    carry, _ = jax.lax.scan(body, carry, jnp.arange(1, seq_len))
    (_, seq_logprob, _, _, _, _, words, gates, word_logps, gate_logps) = carry

    # top_k leaves beams already sorted by score desc (ref sorts again :279)
    return BeamResult(words, gates, word_logps, gate_logps, seq_logprob)


def beam_search_joint_candidates(step_fn: Callable, state: Any, batch: int,
                                 beam_size: int, seq_len: int, eos_word: int,
                                 vocab_size: int,
                                 eos_gate: int = -1,
                                 gather_take_along: bool = False,
                                 select_passenger: bool = False) -> BeamResult:
    """Candidate-based joint beam search — same selection as
    `beam_search_joint` without ever scoring the dense (beam x vocab x gate)
    space.

    `step_fn(state, prev_word, prev_gate, t0) ->
    ((cand_ids (rows, C) int32, cand_wlp (rows, C) f32, g_logp (rows, 2)),
    state)` returns, per decode row, a candidate word set that provably
    contains that row's contribution to the item's joint top-k:

      * non-verb rows: the row's top-k words by logprob (exactness: any word
        outside a row's word-top-k is dominated, within the same row and
        gate, by k better words — so it can never be in the joint top-k);
      * verb-substituted rows: the forced tense word (logp 0) plus the k
        lowest vocab ids (logp -1e6) that reproduce the flat formulation's
        tie-break order over the substituted sea.

    Finished-beam freezing is applied here in candidate space (word 0 pinned
    to the old score, a -999 sea on ids 1..C-1), matching
    `old_seq_logprob[:, :, 1:] = -999` (ref CaptioningModel.py:231-235).
    Ties are broken exactly like the dense flat top-k via a two-key
    `lax.sort` on (-score, flat virtual index beam*V*2 + word*2 + gate).

    select_passenger: carry wlp/glp through the sort as passenger operands
    and derive beam/word/gate arithmetically from the sorted vidx key,
    instead of sorting a position iota and doing four take_along_axis
    gathers afterwards. Bit-exact either way: every output is a sort key,
    a passenger, or pure integer arithmetic on the vidx key, and (score,
    vidx) ties can only occur between entries whose derived outputs are
    identical (candidate ids are distinct within a row; a duplicated vidx
    across slots implies equal wlp too).
    """
    k = beam_size
    v2 = vocab_size * 2

    def select(seq_logprob, cand_ids, cand_wlp, g, frozen=None,
               t0_only_beam0=False):
        b, kk, c = cand_ids.shape
        slot = jnp.arange(c, dtype=jnp.int32)[None, None, :]
        if frozen is not None:
            # frozen beams: word 0 at the old score, -999 sea on ids 1..C-1
            cand_ids = jnp.where(frozen[:, :, None], slot, cand_ids)
        score = (seq_logprob[:, :, None, None] + cand_wlp[:, :, :, None]
                 + g[:, :, None, :])                       # (B, K, C, 2)
        if frozen is not None:
            froz = jnp.where(slot == 0, seq_logprob[:, :, None], -999.0)
            score = jnp.where(frozen[:, :, None, None],
                              froz[:, :, :, None], score)
        if t0_only_beam0:
            score = jnp.where(
                (jnp.arange(kk) == 0)[None, :, None, None], score, -jnp.inf)
        gate_ax = jnp.arange(2, dtype=jnp.int32)[None, None, None, :]
        vidx = (jnp.arange(kk, dtype=jnp.int32)[None, :, None, None] * v2
                + cand_ids[:, :, :, None] * 2 + gate_ax)   # (B, K, C, 2)
        n = kk * c * 2
        flat_score = score.reshape(b, n)
        flat_vidx = vidx.reshape(b, n)
        if select_passenger:
            flat_wlp = jnp.broadcast_to(
                cand_wlp[:, :, :, None], score.shape).reshape(b, n)
            flat_glp = jnp.broadcast_to(
                g[:, :, None, :], score.shape).reshape(b, n)
            neg_s, svidx, s_wlp, s_glp = jax.lax.sort(
                (-flat_score, flat_vidx, flat_wlp, flat_glp), num_keys=2)
            sel_score = -neg_s[:, :k]
            vidx_k = svidx[:, :k]                          # (B, K)
            sel_beam = vidx_k // v2
            rem = vidx_k - sel_beam * v2
            word = rem // 2
            gate = rem - word * 2
            return (sel_score, sel_beam, word.astype(jnp.int32),
                    gate.astype(jnp.int32), s_wlp[:, :k], s_glp[:, :k])
        pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :],
                               (b, n))
        _, _, sel_pos = jax.lax.sort(
            (-flat_score, flat_vidx, pos), num_keys=2)
        sel_pos = sel_pos[:, :k]                           # (B, K)
        take = lambda a: jnp.take_along_axis(a.reshape(b, n), sel_pos, 1)
        sel_score = take(score)
        sel_beam = sel_pos // (c * 2)
        rem = sel_pos - sel_beam * (c * 2)
        sel_slot = rem // 2
        gate = rem - sel_slot * 2
        word = take(jnp.broadcast_to(cand_ids[:, :, :, None],
                                     score.shape).astype(jnp.int32))
        wlp = take(jnp.broadcast_to(cand_wlp[:, :, :, None], score.shape))
        glp = take(jnp.broadcast_to(g[:, :, None, :], score.shape))
        return (sel_score, sel_beam, word, gate.astype(jnp.int32), wlp, glp)

    # ----- t = 0 -------------------------------------------------------------
    zeros_bk = jnp.zeros((batch * k,), jnp.int32)
    (c_ids, c_wlp, g_logp), state = step_fn(state, zeros_bk, zeros_bk, True)
    C = c_ids.shape[-1]
    ids = c_ids.reshape(batch, k, C)
    wlp = c_wlp.reshape(batch, k, C)
    g = g_logp.reshape(batch, k, 2)
    (seq_logprob, sel_beam, word, gate, w_lp0, g_lp0) = select(
        jnp.zeros((batch, k)), ids, wlp, g, t0_only_beam0=True)
    state = _gather_beam(state, sel_beam, batch, k,
                         take_along=gather_take_along)

    words = jnp.zeros((batch, k, seq_len), jnp.int32).at[:, :, 0].set(word)
    gates = jnp.zeros((batch, k, seq_len), jnp.int32).at[:, :, 0].set(gate)
    word_logps = jnp.zeros((batch, k, seq_len)).at[:, :, 0].set(w_lp0)
    gate_logps = jnp.zeros((batch, k, seq_len)).at[:, :, 0].set(g_lp0)
    mask_w = jnp.ones((batch, k))
    mask_g = jnp.ones((batch, k))

    # ----- t >= 1 ------------------------------------------------------------
    def body(carry, t):
        (state, seq_logprob, mask_w, mask_g, word, gate,
         words, gates, word_logps, gate_logps) = carry
        (c_ids, c_wlp, g_logp), state = step_fn(
            state, word.reshape(-1), gate.reshape(-1), False)
        ids = c_ids.reshape(batch, k, C)
        wlp = c_wlp.reshape(batch, k, C)
        g = g_logp.reshape(batch, k, 2)

        mask_w = mask_w * (word != eos_word)
        mask_g = mask_g * (gate != eos_gate)
        mask_full = jnp.clip(mask_w + mask_g, 0.0, 1.0)
        (seq_logprob, sel_beam, word, gate, wlp_sel, glp_sel) = select(
            seq_logprob, ids, wlp, g, frozen=(mask_full == 0.0))

        state = _gather_beam(state, sel_beam, batch, k,
                         take_along=gather_take_along)
        g2 = lambda a: jnp.take_along_axis(a, sel_beam, axis=1)
        g3 = lambda a: jnp.take_along_axis(a, sel_beam[:, :, None], axis=1)
        mask_w, mask_g = g2(mask_w), g2(mask_g)
        words = g3(words).at[:, :, t].set(word)
        gates = g3(gates).at[:, :, t].set(gate)
        word_logps = word_logps.at[:, :, t].set(wlp_sel * mask_w)
        gate_logps = gate_logps.at[:, :, t].set(glp_sel * mask_g)
        return (state, seq_logprob, mask_w, mask_g, word, gate,
                words, gates, word_logps, gate_logps), None

    carry = (state, seq_logprob, mask_w, mask_g, word, gate,
             words, gates, word_logps, gate_logps)
    carry, _ = jax.lax.scan(body, carry, jnp.arange(1, seq_len))
    (_, seq_logprob, _, _, _, _, words, gates, word_logps, gate_logps) = carry
    return BeamResult(words, gates, word_logps, gate_logps, seq_logprob)
