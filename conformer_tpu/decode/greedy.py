"""Batched greedy RNN-T search as a `lax.while_loop` (jit-able).

Vectorized rebuild of the reference's per-utterance Python loop
(basic_greedy_search, /root/reference/src/model.py:214-269), preserving its
semantics exactly:
  - frame-synchronous: at frame t emit symbols until blank,
  - at most `n_steps` non-blank emissions per frame (model.py:241,263 —
    note the reference checks the cap AFTER emitting, so a frame can emit
    the token that reaches the cap and then advance),
  - the predictor steps only on non-blank emissions, carrying (h, c),
  - decoding starts from a blank token with a zero predictor state.

Each while-loop iteration evaluates the joint for a WINDOW of `window`
frames at the current predictor state (the state is constant between
emissions, so leading blank frames can be skipped in bulk — one matmul
[B, W, J] x [J, V] instead of W sequential steps). With ~90% blank frames
this cuts sequential iterations from ~T + emissions to
~T/window + emissions while preserving the reference semantics exactly
(window=1 reduces to the frame-by-frame loop).

The per-utterance state is exposed (GreedyState) so chunked streaming decode
(decode/streaming.py) can carry it across chunks like the reference's
(pred_input_step, pred_cache) threading (model.py:177-199).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..models import joint as joint_mod
from ..models import layers, predictor
from ..models.layers import Params
from ..models.predictor import PredictorState


class GreedyState(NamedTuple):
    """Carry-over decode state for streaming (per batch row)."""

    last_token: jax.Array       # [B] int32, last emitted (or blank at start)
    pred_state: PredictorState  # committed predictor (h, c)
    pred_proj: jax.Array        # [B, J] pred_ffn(predictor_out) for last_token


def init_greedy_state(p: Params, cfg: ModelConfig, batch: int) -> GreedyState:
    tok = jnp.full((batch,), cfg.blank_id, jnp.int32)
    st0 = predictor.init_predictor_state(cfg, batch)
    out, st1 = predictor.predictor_step(p["predictor"], tok, st0, cfg)
    proj = layers.dense(p["joint"]["pred_ffn"], out)
    return GreedyState(last_token=tok, pred_state=st1, pred_proj=proj)


def greedy_search_batch(
    p: Params,
    encoder_out: jax.Array,
    encoder_out_lens: jax.Array,
    cfg: ModelConfig,
    *,
    state: GreedyState | None = None,
    n_steps: int = 64,
    max_hyp_len: int = 256,
    hyps_init: jax.Array | None = None,
    hyp_len_init: jax.Array | None = None,
    window: int = 8,
) -> tuple[jax.Array, jax.Array, GreedyState]:
    """Greedy transducer decode over a batch.

    Args:
        encoder_out: [B, T, D]; encoder_out_lens: [B].
        state: optional carried GreedyState (streaming); fresh if None.
        hyps_init/hyp_len_init: optional pre-filled hypothesis buffers so
            streaming chunks append to the running transcript.
    Returns:
        (hyps [B, max_hyp_len] int32 padded with blank, hyp_lens [B],
         final GreedyState).
    """
    bsz, t_max, _ = encoder_out.shape
    if state is None:
        state = init_greedy_state(p, cfg, bsz)

    enc_proj = layers.dense(p["joint"]["enc_ffn"], encoder_out)  # [B, T, J]

    class Carry(NamedTuple):
        t: jax.Array
        noblk: jax.Array
        hyps: jax.Array
        hyp_len: jax.Array
        dstate: GreedyState

    init = Carry(
        t=jnp.zeros((bsz,), jnp.int32),
        noblk=jnp.zeros((bsz,), jnp.int32),
        hyps=(
            hyps_init
            if hyps_init is not None
            else jnp.full((bsz, max_hyp_len), cfg.blank_id, jnp.int32)
        ),
        hyp_len=(
            hyp_len_init if hyp_len_init is not None else jnp.zeros((bsz,), jnp.int32)
        ),
        dstate=state,
    )

    def cond(c: Carry):
        return jnp.any(c.t < encoder_out_lens)

    w_idx = jnp.arange(window)

    def body(c: Carry):
        active = c.t < encoder_out_lens
        idx = jnp.minimum(c.t[:, None] + w_idx[None, :], t_max - 1)  # [B, W]
        enc_win = jnp.take_along_axis(
            enc_proj, idx[:, :, None], axis=1
        )                                                    # [B, W, J]
        logits = layers.dense(
            p["joint"]["ffn_out"],
            jnp.tanh(enc_win + c.dstate.pred_proj[:, None, :]),
        )                                                    # [B, W, V]
        best_w = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, W]
        valid_w = (c.t[:, None] + w_idx[None, :]) < encoder_out_lens[:, None]
        blank_w = (best_w == cfg.blank_id) | ~valid_w
        # leading run of blanks: these frames advance without emitting
        nb_raw = jnp.sum(jnp.cumprod(blank_w.astype(jnp.int32), axis=1),
                         axis=1)                              # [B] in 0..W
        frames_left = jnp.maximum(encoder_out_lens - c.t, 0)
        found = (nb_raw < window) & (nb_raw < frames_left)
        best = jnp.take_along_axis(
            best_w, jnp.minimum(nb_raw, window - 1)[:, None], axis=1
        )[:, 0]

        emit = active & found & (c.hyp_len < max_hyp_len)
        # emissions on the same frame (nb_raw == 0) keep counting toward the
        # per-frame cap; a fresh frame (nb_raw > 0, i.e. blanks consumed)
        # starts at 1 (reference model.py:241,263 semantics).
        new_noblk = jnp.where(nb_raw > 0, 1, c.noblk + 1)

        hyps = jnp.where(
            emit[:, None]
            & (jnp.arange(max_hyp_len)[None, :] == c.hyp_len[:, None]),
            best[:, None],
            c.hyps,
        )
        hyp_len = jnp.where(emit, c.hyp_len + 1, c.hyp_len)

        # Predictor step for rows that emitted (computed for all, selected).
        tok = jnp.where(emit, best, c.dstate.last_token)
        out, st = predictor.predictor_step(
            p["predictor"], tok, c.dstate.pred_state, cfg,
            padding=(~emit).astype(jnp.int32),
        )
        proj = layers.dense(p["joint"]["pred_ffn"], out)
        keep = emit[:, None]
        dstate = GreedyState(
            last_token=tok,
            pred_state=st,
            pred_proj=jnp.where(keep, proj, c.dstate.pred_proj),
        )
        # Frame pointer: consume the leading blanks; skip one more frame if
        # the emission hit the per-frame cap or the hypothesis buffer is
        # full (the frame-advance branches of the reference loop).
        nb_skip = jnp.minimum(nb_raw, frames_left)
        skip_frame = (emit & (new_noblk >= n_steps)) | (
            active & found & (c.hyp_len >= max_hyp_len)
        )
        t_new = jnp.where(
            active, c.t + nb_skip + skip_frame.astype(jnp.int32), c.t
        )
        noblk = jnp.where(emit & (new_noblk < n_steps), new_noblk, 0)
        return Carry(
            t=t_new,
            noblk=noblk,
            hyps=hyps,
            hyp_len=hyp_len,
            dstate=dstate,
        )

    final = jax.lax.while_loop(cond, body, init)
    return final.hyps, final.hyp_len, final.dstate


def greedy_search(
    p: Params,
    feats: jax.Array,
    feat_lengths: jax.Array,
    cfg: ModelConfig,
    *,
    n_steps: int = 64,
    max_hyp_len: int = 256,
) -> tuple[jax.Array, jax.Array]:
    """Full-utterance greedy decode: encoder forward + greedy search.

    Corresponds to reference Transducer.greedy_search (model.py:201-212) —
    including its quirk that the "chunked" eval path collapses to one big
    chunk, i.e. full-context encoding (model.py:206-209, SURVEY.md §3.2).
    """
    from ..models import transducer

    enc_out, enc_lens = transducer.encode(p, feats, feat_lengths, cfg)
    hyps, lens, _ = greedy_search_batch(
        p, enc_out, enc_lens, cfg, n_steps=n_steps, max_hyp_len=max_hyp_len
    )
    return hyps, lens
