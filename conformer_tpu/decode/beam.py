"""RNN-T beam search (label-synchronous, breadth-first over frames).

The reference only implements greedy transducer decode; BASELINE configs
call for beam search with lattice state exchanged via collectives on the
multi-chip path. This module provides the algorithmic reference: a
frame-synchronous beam (Graves 2012 style, with prefix merging) over one
utterance, driving the pure predictor/joint functions. Batched/jitted beam
is follow-up work tracked in docs/ROADMAP.md.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models import joint as joint_mod
from ..models import predictor
from ..models.layers import Params
from ..models.predictor import PredictorState


def _log_add(a: float, b: float) -> float:
    if a == -math.inf:
        return b
    if b == -math.inf:
        return a
    hi, lo = (a, b) if a > b else (b, a)
    return hi + math.log1p(math.exp(lo - hi))


@dataclass
class Hyp:
    tokens: tuple[int, ...]
    log_prob: float
    state: PredictorState
    pred_out: jax.Array  # [1, P] predictor output for tokens (last consumed)

    def key(self) -> tuple[int, ...]:
        return self.tokens


def rnnt_beam_search(
    p: Params,
    encoder_out: jax.Array,
    encoder_out_len: int,
    cfg: ModelConfig,
    beam_size: int = 8,
    max_expansions: int = 3,
) -> list[tuple[list[int], float]]:
    """Beam search over one utterance (encoder_out [T, D]).

    Frame-synchronous: at each frame, hypotheses expand up to
    `max_expansions` non-blank emissions before being forced to take blank;
    identical prefixes are merged by log-sum-exp.
    Returns [(tokens, log_prob)] best-first.
    """
    blank = cfg.blank_id
    tok0 = jnp.asarray([blank], jnp.int32)
    st0 = predictor.init_predictor_state(cfg, 1)
    out0, st1 = predictor.predictor_step(p["predictor"], tok0, st0, cfg)
    beams: list[Hyp] = [Hyp((), 0.0, st1, out0)]

    for t in range(encoder_out_len):
        enc_t = encoder_out[t : t + 1]                     # [1, D]
        # A-list: hyps allowed to still emit at this frame; B-list: done.
        a_list = beams
        b_list: dict[tuple[int, ...], Hyp] = {}
        for _ in range(max_expansions + 1):
            if not a_list:
                break
            next_a: dict[tuple[int, ...], Hyp] = {}
            for hyp in a_list:
                logits = joint_mod.joint_step(p["joint"], enc_t, hyp.pred_out)
                logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
                logp_np = np.asarray(logp)[0]
                # blank: hyp survives to the next frame unchanged
                b_lp = hyp.log_prob + float(logp_np[blank])
                cur = b_list.get(hyp.tokens)
                if cur is None:
                    b_list[hyp.tokens] = Hyp(
                        hyp.tokens, b_lp, hyp.state, hyp.pred_out
                    )
                else:
                    cur.log_prob = _log_add(cur.log_prob, b_lp)
                # top non-blank expansions (clamped: beam may exceed vocab)
                n_top = min(beam_size, logp_np.shape[0])
                top = np.argpartition(logp_np, -n_top)[-n_top:]
                for v in top:
                    v = int(v)
                    if v == blank:
                        continue
                    lp = hyp.log_prob + float(logp_np[v])
                    tokens = hyp.tokens + (v,)
                    existing = next_a.get(tokens)
                    if existing is not None:
                        existing.log_prob = _log_add(existing.log_prob, lp)
                        continue
                    out, st = predictor.predictor_step(
                        p["predictor"], jnp.asarray([v], jnp.int32),
                        hyp.state, cfg,
                    )
                    next_a[tokens] = Hyp(tokens, lp, st, out)
            a_list = sorted(next_a.values(), key=lambda h: -h.log_prob)[
                :beam_size
            ]
        beams = sorted(b_list.values(), key=lambda h: -h.log_prob)[:beam_size]

    return [(list(h.tokens), h.log_prob) for h in beams]


def rnnt_beam_decode(
    p: Params,
    encoder_out: jax.Array,
    encoder_out_lens: jax.Array,
    cfg: ModelConfig,
    beam_size: int = 8,
) -> list[list[int]]:
    """Batch wrapper: per-utterance beam over device encoder output."""
    lens = np.asarray(encoder_out_lens)
    out = []
    for i in range(encoder_out.shape[0]):
        beam = rnnt_beam_search(
            p, encoder_out[i], int(lens[i]), cfg, beam_size
        )
        out.append(beam[0][0] if beam else [])
    return out
