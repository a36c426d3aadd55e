"""Batched RNN-T beam search under jit.

TPU-native beam: a `lax.scan` over frames; per frame up to `max_expansions`
non-blank expansion rounds, each one joint evaluation [B, K, V] on the MXU
plus a device top-K. Hypotheses that take blank are frozen into the
frame's survivor set; survivors seed the next frame. At the end of each
frame, hypotheses with identical label prefixes (different alignments of
the same labels) are merged by log-sum-exp on device — an O(K^2 L)
elementwise pass, negligible next to the joint matmuls (see
decode/beam.py for the per-hypothesis host reference of the same
Graves-2012 merging rule).

All state is static-shape: tokens [B, K, L], predictor (h, c) per
hypothesis, log-probs [B, K]. Works inside pjit (beam state shards over the
"data" axis with the batch).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..models import layers, predictor
from ..models.layers import Params
from ..models.predictor import PredictorState

_NEG_INF = -1e30


class BeamState(NamedTuple):
    tokens: jax.Array      # [B, K, L]
    lengths: jax.Array     # [B, K]
    log_probs: jax.Array   # [B, K]
    pred_h: jax.Array      # [Lp, B, K, H]
    pred_c: jax.Array      # [Lp, B, K, H]
    pred_proj: jax.Array   # [B, K, J]


def _flat_pred_state(h, c) -> PredictorState:
    lp, b, k, hd = h.shape
    return PredictorState(h=h.reshape(lp, b * k, hd), c=c.reshape(lp, b * k, hd))


def _merge_duplicate_prefixes(state: BeamState) -> BeamState:
    """Log-sum-exp hypotheses with identical label prefixes.

    Two beam slots holding the same token sequence are different
    *alignments* of the same labels; their path probabilities add.  The
    predictor state is a deterministic function of the token sequence, so
    keeping the lowest-index slot's state is lossless.  Non-representative
    duplicates are killed (-inf) rather than compacted — slots are static
    under jit — which mildly narrows the effective beam for one frame, the
    standard batched-beam tradeoff.
    """
    bsz, k, max_len = state.tokens.shape
    pos = jnp.arange(max_len)
    len_eq = state.lengths[:, :, None] == state.lengths[:, None, :]   # [B,K,K]
    within = pos[None, None, None, :] < state.lengths[:, :, None, None]
    tok_eq = jnp.where(
        within, state.tokens[:, :, None, :] == state.tokens[:, None, :, :], True
    )
    eq = len_eq & jnp.all(tok_eq, axis=-1)                            # [B,K,K]
    rep = jnp.argmax(eq, axis=-1)            # first slot holding this prefix
    is_rep = rep == jnp.arange(k)[None, :]
    pooled = jax.nn.logsumexp(
        jnp.where(eq, state.log_probs[:, None, :], _NEG_INF), axis=-1
    )
    new_lp = jnp.where(is_rep, pooled, _NEG_INF).astype(state.log_probs.dtype)
    return state._replace(log_probs=new_lp)


def beam_search_batch(
    p: Params,
    encoder_out: jax.Array,
    encoder_out_lens: jax.Array,
    cfg: ModelConfig,
    *,
    beam_size: int = 8,
    max_expansions: int = 2,
    max_hyp_len: int = 256,
    merge_prefixes: bool = True,
    blank_skip_window: int = 0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Beam decode a batch.

    Args:
        encoder_out: [B, T, D]; encoder_out_lens: [B].
        merge_prefixes: pool alignments of identical label sequences by
            log-sum-exp (Graves-2012 semantics). Off = pure Viterbi-style
            beam (each slot one alignment).
        blank_skip_window: 0 = off (one full frame_step per frame). >0 =
            approximate blank-run skipping: per batch row, a window of
            this many frames is scored with ONE joint evaluation and the
            leading run of frames where every LIVE slot's blank extension
            beats every live emission candidate is consumed as pure blank
            moves; only the first contested frame gets the full expansion
            treatment. Approximation (ROADMAP "live-slot comparison"):
            when merging has left dead (-inf) slots, the exact beam would
            refill them with emission candidates the skip prunes —
            measured-WER-neutral on the micro corpus (docs/PERF.md r5).
    Returns:
        (tokens [B, K, max_hyp_len] blank-padded, lengths [B, K],
         log_probs [B, K]) sorted best-first along K.
    """
    bsz, t_max, _ = encoder_out.shape
    k = beam_size
    v = cfg.vocab_size
    lp_layers = cfg.predictor_num_layers
    hd = cfg.predictor_hidden_size

    enc_proj = layers.dense(p["joint"]["enc_ffn"], encoder_out)  # [B, T, J]
    j_dim = enc_proj.shape[-1]

    # init: hypothesis 0 is the empty hyp; others dead (-inf).
    tok0 = jnp.full((bsz * k,), cfg.blank_id, jnp.int32)
    st0 = predictor.init_predictor_state(cfg, bsz * k)
    out0, st1 = predictor.predictor_step(p["predictor"], tok0, st0, cfg)
    proj0 = layers.dense(p["joint"]["pred_ffn"], out0)           # [B*K, J]

    init = BeamState(
        tokens=jnp.full((bsz, k, max_hyp_len), cfg.blank_id, jnp.int32),
        lengths=jnp.zeros((bsz, k), jnp.int32),
        log_probs=jnp.where(
            jnp.arange(k)[None, :] == 0, 0.0, _NEG_INF
        ).astype(jnp.float32) * jnp.ones((bsz, 1)),
        pred_h=st1.h.reshape(lp_layers, bsz, k, hd),
        pred_c=st1.c.reshape(lp_layers, bsz, k, hd),
        pred_proj=proj0.reshape(bsz, k, j_dim),
    )

    def joint_logp(enc_t, pred_proj):
        # enc_t [B, J], pred_proj [B, K, J] -> log-probs [B, K, V]
        x = jnp.tanh(enc_t[:, None, :] + pred_proj)
        logits = layers.dense(p["joint"]["ffn_out"], x)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    def gather_k(x, idx):
        """Gather along the K axis: x [B, K, ...], idx [B, K'] -> [B, K', ...]."""
        return jnp.take_along_axis(
            x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1
        )

    def process_frame(state: BeamState, enc_t, active_frame):
        """One full beam frame: expansion rounds + forced blank + merging.

        enc_t: [B, J] this frame's projected encoder row (may differ per
        batch row — the blank-skip path advances rows independently);
        active_frame: [B, 1] rows for which this frame is real work.
        """
        # Survivor ("done") set for this frame: K slots, start dead.
        done_scores = jnp.full((bsz, k), _NEG_INF)
        done_state = state

        a_state = state

        def expansion(carry, _):
            a_state, done_state, done_scores = carry
            logp = joint_logp(enc_t, a_state.pred_proj)           # [B, K, V]
            blank_lp = logp[:, :, cfg.blank_id]

            # 1) blank move: freeze current hyps into the done set.
            cand_scores = jnp.concatenate(
                [done_scores, a_state.log_probs + blank_lp], axis=1
            )                                                      # [B, 2K]
            top_scores, top_idx = jax.lax.top_k(cand_scores, k)
            from_new = top_idx >= k                                # [B, K]
            src = jnp.where(from_new, top_idx - k, top_idx)

            def merge(d_field, a_field):
                d_g = gather_k(d_field, jnp.where(from_new, 0, src))
                a_g = gather_k(a_field, jnp.where(from_new, src, 0))
                shape = (bsz, k) + (1,) * (d_field.ndim - 2)
                return jnp.where(from_new.reshape(shape), a_g, d_g)

            new_done = BeamState(
                tokens=merge(done_state.tokens, a_state.tokens),
                lengths=merge(done_state.lengths, a_state.lengths),
                log_probs=top_scores,
                pred_h=jnp.moveaxis(
                    merge(
                        jnp.moveaxis(done_state.pred_h, 0, 2),
                        jnp.moveaxis(a_state.pred_h, 0, 2),
                    ), 2, 0,
                ),
                pred_c=jnp.moveaxis(
                    merge(
                        jnp.moveaxis(done_state.pred_c, 0, 2),
                        jnp.moveaxis(a_state.pred_c, 0, 2),
                    ), 2, 0,
                ),
                pred_proj=merge(done_state.pred_proj, a_state.pred_proj),
            )
            if merge_prefixes:
                # Pool within-frame duplicate freezes (same labels frozen at
                # different expansion depths) before the next round's top-K.
                new_done = _merge_duplicate_prefixes(new_done)
            new_done_scores = new_done.log_probs

            # 2) non-blank expansions: top-K over K*V.
            nb_logp = logp.at[:, :, cfg.blank_id].set(_NEG_INF)
            can_grow = a_state.lengths < max_hyp_len               # [B, K]
            exp_scores = jnp.where(
                can_grow[:, :, None], a_state.log_probs[:, :, None] + nb_logp,
                _NEG_INF,
            ).reshape(bsz, k * v)
            top_e, idx_e = jax.lax.top_k(exp_scores, k)            # [B, K]
            src_hyp = idx_e // v
            new_tok = (idx_e % v).astype(jnp.int32)

            tokens = gather_k(a_state.tokens, src_hyp)
            lengths = gather_k(a_state.lengths, src_hyp)
            pos_mask = (
                jnp.arange(max_hyp_len)[None, None, :] == lengths[:, :, None]
            )
            tokens = jnp.where(pos_mask, new_tok[:, :, None], tokens)
            lengths = jnp.minimum(lengths + 1, max_hyp_len)

            h_g = jnp.moveaxis(gather_k(jnp.moveaxis(a_state.pred_h, 0, 2), src_hyp), 2, 0)
            c_g = jnp.moveaxis(gather_k(jnp.moveaxis(a_state.pred_c, 0, 2), src_hyp), 2, 0)
            out, st = predictor.predictor_step(
                p["predictor"], new_tok.reshape(-1), _flat_pred_state(h_g, c_g), cfg
            )
            proj = layers.dense(p["joint"]["pred_ffn"], out).reshape(bsz, k, j_dim)
            new_a = BeamState(
                tokens=tokens,
                lengths=lengths,
                log_probs=top_e,
                pred_h=st.h.reshape(lp_layers, bsz, k, hd),
                pred_c=st.c.reshape(lp_layers, bsz, k, hd),
                pred_proj=proj,
            )
            return (new_a, new_done, new_done_scores), None

        (a_state, done_state, done_scores), _ = jax.lax.scan(
            expansion, (a_state, done_state, done_scores), None,
            length=max_expansions,
        )
        # Final forced-blank for remaining A-list hyps.
        logp = joint_logp(enc_t, a_state.pred_proj)
        cand_scores = jnp.concatenate(
            [done_scores, a_state.log_probs + logp[:, :, cfg.blank_id]], axis=1
        )
        top_scores, top_idx = jax.lax.top_k(cand_scores, k)
        from_new = top_idx >= k
        src = jnp.where(from_new, top_idx - k, top_idx)

        def merge(d_field, a_field):
            d_g = gather_k(d_field, jnp.where(from_new, 0, src))
            a_g = gather_k(a_field, jnp.where(from_new, src, 0))
            shape = (bsz, k) + (1,) * (d_field.ndim - 2)
            return jnp.where(from_new.reshape(shape), a_g, d_g)

        merged = BeamState(
            tokens=merge(done_state.tokens, a_state.tokens),
            lengths=merge(done_state.lengths, a_state.lengths),
            log_probs=top_scores,
            pred_h=jnp.moveaxis(
                merge(jnp.moveaxis(done_state.pred_h, 0, 2),
                      jnp.moveaxis(a_state.pred_h, 0, 2)), 2, 0),
            pred_c=jnp.moveaxis(
                merge(jnp.moveaxis(done_state.pred_c, 0, 2),
                      jnp.moveaxis(a_state.pred_c, 0, 2)), 2, 0),
            pred_proj=merge(done_state.pred_proj, a_state.pred_proj),
        )
        if merge_prefixes:
            # Same labels reached via different alignments: pool their mass.
            merged = _merge_duplicate_prefixes(merged)
        # Inactive frames (t >= len): keep previous state untouched.
        keep = active_frame  # [B, 1]

        def sel(new, old):
            shape = (bsz, 1) + (1,) * (new.ndim - 2)
            return jnp.where(keep.reshape(shape), new, old)

        out_state = BeamState(
            tokens=sel(merged.tokens, state.tokens),
            lengths=sel(merged.lengths, state.lengths),
            log_probs=jnp.where(keep, merged.log_probs, state.log_probs),
            pred_h=jnp.moveaxis(
                sel(jnp.moveaxis(merged.pred_h, 0, 2),
                    jnp.moveaxis(state.pred_h, 0, 2)), 2, 0),
            pred_c=jnp.moveaxis(
                sel(jnp.moveaxis(merged.pred_c, 0, 2),
                    jnp.moveaxis(state.pred_c, 0, 2)), 2, 0),
            pred_proj=sel(merged.pred_proj, state.pred_proj),
        )
        return out_state

    def frame_step(state: BeamState, t):
        enc_t = jnp.take_along_axis(
            enc_proj, jnp.broadcast_to(t.reshape(1, 1, 1), (bsz, 1, 1)), axis=1
        )[:, 0, :]
        return process_frame(state, enc_t, (t < encoder_out_lens)[:, None]), None

    if blank_skip_window > 0:
        final = _run_blank_skip(
            init, enc_proj, encoder_out_lens, joint_logp, process_frame,
            cfg.blank_id, blank_skip_window,
            require_saturated=not merge_prefixes,
        )
    else:
        final, _ = jax.lax.scan(frame_step, init, jnp.arange(t_max))

    order = jnp.argsort(-final.log_probs, axis=1)
    return (
        gather_k(final.tokens, order),
        gather_k(final.lengths, order),
        jnp.take_along_axis(final.log_probs, order, axis=1),
    )


def gather_k(x, idx):
    return jnp.take_along_axis(
        x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1
    )


def _run_blank_skip(init, enc_proj, encoder_out_lens, joint_logp,
                    process_frame, blank, w, require_saturated=False):
    """Beam loop with approximate blank-run skipping (live-slot variant).

    Rows advance independently: each outer iteration scores a w-frame
    window with one joint evaluation (pred_proj is constant across a blank
    run, so the window's log-probs are exact), consumes the leading
    skippable run as pure blank moves, then runs the full expansion
    machinery on the first contested frame only. The greedy decoder's
    windowed blank-skip (decode/greedy.py), generalized to a beam.

    Skip condition at a frame (per batch row): min over LIVE slots of
    (log_prob + blank) > max over live slots of (log_prob + best
    non-blank). Every live slot then takes blank in the exact beam; what
    the approximation forgoes is refilling DEAD (merged) slots with
    emission candidates — those would start at least one full emission
    below every surviving hypothesis.

    require_saturated (merge-free Viterbi mode): additionally demand that
    EVERY slot is live before skipping. Without prefix merging the only
    dead slots are the pre-saturation initial ones, so under this flag the
    skip is exact — bit-identical to the per-frame beam (tested in
    tests/test_beam_batched.py::test_blank_skip_exact_in_viterbi_mode).
    """
    bsz, t_max, _ = enc_proj.shape
    joint_win = jax.vmap(joint_logp, in_axes=(1, None), out_axes=1)

    def cond(carry):
        _, row_t = carry
        return jnp.any(row_t < encoder_out_lens)

    def body(carry):
        state, row_t = carry
        offs = row_t[:, None] + jnp.arange(w)[None, :]            # [B, w]
        idx = jnp.minimum(offs, t_max - 1)
        enc_win = jnp.take_along_axis(
            enc_proj, idx[:, :, None], axis=1
        )                                                          # [B, w, J]
        logp_win = joint_win(enc_win, state.pred_proj)             # [B,w,K,V]
        blank_win = logp_win[..., blank]                           # [B, w, K]
        maxnb_win = jnp.max(
            logp_win.at[..., blank].set(_NEG_INF), axis=-1
        )                                                          # [B, w, K]
        valid_f = offs < encoder_out_lens[:, None]                 # [B, w]

        def skip_f(carry, f):
            lp, skipping, n_skip = carry
            live = lp > _NEG_INF * 0.5
            b_ext = jnp.where(live, lp + blank_win[:, f], jnp.inf)
            e_cand = jnp.where(live, lp + maxnb_win[:, f], -jnp.inf)
            ok = (
                (jnp.min(b_ext, axis=1) > jnp.max(e_cand, axis=1))
                & valid_f[:, f]
                & skipping
            )                                                      # [B]
            if require_saturated:
                ok = ok & jnp.all(live, axis=1)
            lp = jnp.where(
                ok[:, None] & live, lp + blank_win[:, f], lp
            )
            return (lp, ok, n_skip + ok.astype(jnp.int32)), None

        (lp, _, n_skip), _ = jax.lax.scan(
            skip_f,
            (state.log_probs, jnp.ones((bsz,), bool),
             jnp.zeros((bsz,), jnp.int32)),
            jnp.arange(w),
        )
        state = state._replace(log_probs=lp)

        # full treatment for the first contested frame of each row (rows
        # that skipped the whole window, or are finished, sit this out)
        t_proc = row_t + n_skip
        process = (t_proc < encoder_out_lens) & (n_skip < w)       # [B]
        enc_t = jnp.take_along_axis(
            enc_proj, jnp.minimum(t_proc, t_max - 1)[:, None, None], axis=1
        )[:, 0, :]
        state = process_frame(state, enc_t, process[:, None])
        # processed rows advance past the contested frame; finished rows
        # must still advance so the loop terminates
        row_t = t_proc + jnp.where(
            process | (n_skip == 0), 1, 0
        ).astype(jnp.int32)
        return state, row_t

    final, _ = jax.lax.while_loop(
        cond, body, (init, jnp.zeros((bsz,), jnp.int32))
    )
    return final
