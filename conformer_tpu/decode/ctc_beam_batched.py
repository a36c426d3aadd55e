"""Batched CTC prefix beam search under jit.

Device-side replacement for the host loop in ctc_decode.ctc_prefix_beam_search
(itself the standard Hannun et al. (p_blank, p_nonblank) prefix beam the
reference's WeNet lineage uses for attention rescoring n-best). One
`lax.scan` over frames; per frame:

  1. every surviving prefix takes its two "stay" transitions (blank keeps
     both endings; repeating the last label keeps the non-blank ending),
  2. the per-frame top-C labels spawn K*C "extend" candidates, scored
     pb (repeat-with-gap) or pb+pnb (new label),
  3. extends whose resulting labels already sit in a beam slot merge into
     that slot by log-add (exact Hannun semantics) instead of duplicating
     it — a [B, K, C, K] equality pass over static shapes,
  4. device top-K over the K + K*C pooled totals re-forms the beam.

All state is static-shape (tokens [B, K, L], (pb, pnb) [B, K]); the whole
search jits and shards over the "data" mesh axis with the batch. With
top_c = vocab_size this is EXACT prefix beam search (matches the host
reference bit-for-float32-bit); smaller top_c is the usual pruning.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..models import ctc_head
from ..models.layers import Params

_NEG_INF = -1e30


class CtcBeamState(NamedTuple):
    tokens: jax.Array   # [B, K, L] int32 (blank-padded)
    lengths: jax.Array  # [B, K] int32
    pb: jax.Array       # [B, K] log P(prefix, ends in blank)
    pnb: jax.Array      # [B, K] log P(prefix, ends in non-blank)


def _logaddexp(a, b):
    hi = jnp.maximum(a, b)
    lo = jnp.minimum(a, b)
    safe = hi > 0.5 * _NEG_INF
    return jnp.where(safe, hi + jnp.log1p(jnp.exp(lo - hi)), _NEG_INF)


def ctc_prefix_beam_batch(
    log_probs: jax.Array,
    lengths: jax.Array,
    *,
    beam_size: int = 8,
    blank: int = 0,
    max_hyp_len: int = 256,
    top_c: int = 16,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Batched, jittable CTC prefix beam search.

    Args:
        log_probs: [B, T, V] frame log-probs (log-softmaxed).
        lengths: [B] valid frame counts.
        top_c: per-frame candidate labels (pruning); V for exact search.
    Returns:
        (tokens [B, K, max_hyp_len] blank-padded, lengths [B, K],
         scores [B, K] = logaddexp(pb, pnb)), sorted best-first along K.
    """
    bsz, t_max, v = log_probs.shape
    k = beam_size
    c = min(top_c, v)
    el = max_hyp_len
    pos = jnp.arange(el)

    init = CtcBeamState(
        tokens=jnp.full((bsz, k, el), blank, jnp.int32),
        lengths=jnp.zeros((bsz, k), jnp.int32),
        # slot 0 = empty prefix with certainty; the rest dead
        pb=jnp.where(jnp.arange(k)[None, :] == 0, 0.0, _NEG_INF)
        * jnp.ones((bsz, 1)),
        pnb=jnp.full((bsz, k), _NEG_INF),
    )

    def frame_step(state: CtcBeamState, xs):
        frame, t = xs                                   # [B, V], scalar
        active = (t < lengths)[:, None]                 # [B, 1]
        ptot = _logaddexp(state.pb, state.pnb)          # [B, K]

        # ---- stay transitions -------------------------------------------
        blank_lp = frame[:, blank][:, None]             # [B, 1]
        pb_stay = ptot + blank_lp                       # [B, K]
        last = jnp.take_along_axis(
            state.tokens,
            jnp.maximum(state.lengths - 1, 0)[:, :, None],
            axis=2,
        )[:, :, 0]                                      # [B, K]
        has_last = state.lengths > 0
        last_lp = jnp.take_along_axis(
            frame, jnp.where(has_last, last, 0), axis=1
        )                                               # [B, K]
        # repeat WITHOUT a blank gap extends the same prefix's pnb
        pnb_stay = jnp.where(has_last, state.pnb + last_lp, _NEG_INF)

        # ---- extend candidates ------------------------------------------
        cv, ci = jax.lax.top_k(frame, c)                # [B, C]
        is_blank = ci == blank                          # [B, C]
        is_last = ci[:, None, :] == jnp.where(has_last, last, -1)[:, :, None]
        # repeat WITH a gap only continues from the blank ending
        ext = (
            jnp.where(is_last, state.pb[:, :, None], ptot[:, :, None])
            + cv[:, None, :]
        )                                               # [B, K, C]
        can_grow = state.lengths < el
        ext = jnp.where(is_blank[:, None, :], _NEG_INF, ext)
        ext = jnp.where(can_grow[:, :, None], ext, _NEG_INF)

        # ---- merge extends into existing beam slots ---------------------
        # extend (k, c) forms prefix_k + ci; if some slot j already holds
        # exactly that label sequence, the mass log-adds into j's pnb
        # (Hannun's dict-keyed merge) and the extend slot dies.
        len_match = (
            state.lengths[:, None, :] == state.lengths[:, :, None] + 1
        )                                               # [B, Kext, Kstay]
        within = pos[None, None, None, :] < state.lengths[:, :, None, None]
        tok_eq = jnp.where(
            within,
            state.tokens[:, :, None, :] == state.tokens[:, None, :, :],
            True,
        )
        prefix_eq = len_match & jnp.all(tok_eq, axis=-1)   # [B, Kext, Kstay]
        tok_at_len = jnp.take_along_axis(
            jnp.broadcast_to(state.tokens[:, None, :, :], (bsz, k, k, el)),
            jnp.broadcast_to(
                state.lengths[:, :, None, None], (bsz, k, k, 1)
            ).clip(0, el - 1),
            axis=3,
        )[..., 0]                                       # [B, Kext, Kstay]
        match = (
            prefix_eq[:, :, None, :]
            & (tok_at_len[:, :, None, :] == ci[:, None, :, None])
        )                                               # [B, K, C, Kstay]
        # each extend merges into at most ONE stay — prefer the live copy
        # (duplicate prefixes can only exist with one live copy, see tests)
        stay_key = jnp.where(match, ptot[:, None, None, :], _NEG_INF)
        j_sel = jnp.argmax(stay_key, axis=-1)           # [B, K, C]
        match = match & (
            jnp.arange(k)[None, None, None, :] == j_sel[..., None]
        )
        merged_away = jnp.any(match, axis=-1)           # [B, K, C]
        add_mass = jnp.where(
            match, ext[:, :, :, None], _NEG_INF
        ).reshape(bsz, k * c, k)
        m = jnp.max(add_mass, axis=1)                   # [B, Kstay]
        safe_m = jnp.where(m > 0.5 * _NEG_INF, m, 0.0)
        pnb_add = jnp.where(
            m > 0.5 * _NEG_INF,
            safe_m
            + jnp.log(
                jnp.sum(jnp.exp(add_mass - safe_m[:, None, :]), axis=1)
            ),
            _NEG_INF,
        )
        pnb_stay = _logaddexp(pnb_stay, pnb_add)
        ext = jnp.where(merged_away, _NEG_INF, ext)

        # ---- pool stays + extends, top-K --------------------------------
        stay_total = _logaddexp(pb_stay, pnb_stay)      # [B, K]
        pool_total = jnp.concatenate(
            [stay_total, ext.reshape(bsz, k * c)], axis=1
        )                                               # [B, K + K*C]
        top_scores, top_idx = jax.lax.top_k(pool_total, k)
        from_ext = top_idx >= k
        stay_j = jnp.where(from_ext, 0, top_idx)        # [B, K]
        ext_k = jnp.where(from_ext, (top_idx - k) // c, 0)
        ext_c = jnp.where(from_ext, (top_idx - k) % c, 0)

        def gk(x, idx):
            return jnp.take_along_axis(
                x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1
            )

        # stays keep tokens; extends append ci[ext_c] at position len
        src = jnp.where(from_ext, ext_k, stay_j)
        toks = gk(state.tokens, src)                    # [B, K, L]
        lens_src = gk(state.lengths[..., None], src)[..., 0]
        new_tok = jnp.take_along_axis(ci, ext_c, axis=1)  # [B, K]
        write = from_ext[:, :, None] & (
            pos[None, None, :] == lens_src[:, :, None]
        )
        toks = jnp.where(write, new_tok[:, :, None], toks)
        new_lens = lens_src + from_ext.astype(jnp.int32)

        new_pb = jnp.where(
            from_ext, _NEG_INF, gk(pb_stay[..., None], stay_j)[..., 0]
        )
        new_pnb = jnp.where(
            from_ext,
            jnp.take_along_axis(
                ext.reshape(bsz, k * c),
                jnp.where(from_ext, top_idx - k, 0),
                axis=1,
            ),
            gk(pnb_stay[..., None], stay_j)[..., 0],
        )

        new_state = CtcBeamState(
            tokens=jnp.where(active[:, :, None], toks, state.tokens),
            lengths=jnp.where(active, new_lens, state.lengths),
            pb=jnp.where(active, new_pb, state.pb),
            pnb=jnp.where(active, new_pnb, state.pnb),
        )
        return new_state, None

    xs = (jnp.moveaxis(log_probs, 1, 0), jnp.arange(t_max))  # [T, B, V]
    final, _ = jax.lax.scan(frame_step, init, xs)

    scores = _logaddexp(final.pb, final.pnb)
    order = jnp.argsort(-scores, axis=1)
    toks = jnp.take_along_axis(final.tokens, order[:, :, None], axis=1)
    lens = jnp.take_along_axis(final.lengths, order, axis=1)
    return toks, lens, jnp.take_along_axis(scores, order, axis=1)


def ctc_prefix_beam_decode_batch(
    p: Params,
    encoder_out: jax.Array,
    encoder_out_lens: jax.Array,
    cfg: ModelConfig,
    *,
    beam_size: int = 8,
    max_hyp_len: int = 256,
    top_c: int = 16,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Device n-best: encoder output -> (tokens [B, K, L], lens, scores)."""
    logits = ctc_head.ctc_logits(p["ctc"], encoder_out)
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return ctc_prefix_beam_batch(
        log_probs, encoder_out_lens, beam_size=beam_size,
        blank=cfg.blank_id, max_hyp_len=max_hyp_len, top_c=top_c,
    )
