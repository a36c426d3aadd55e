"""CTC decoding: vectorized greedy + prefix beam search.

The reference trains a CTC head (src/decoder.py:7-23) but never decodes with
it; BASELINE config #2 calls for CTC greedy + prefix-beam decoding, added
here as a first-class path.

- `ctc_greedy_search`: fully vectorized/jittable (argmax -> collapse
  repeats -> drop blanks).
- `ctc_prefix_beam_search`: host-side reference implementation of the
  standard (p_blank, p_nonblank) prefix beam (Hannun et al.), operating on
  device-computed log-probs; per-frame top-K pruning keeps it fast.
"""

from __future__ import annotations

import math
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models import ctc_head
from ..models.layers import Params

_LOG_ZERO = -float("inf")


def ctc_greedy_search(
    log_probs: jax.Array, lengths: jax.Array, blank: int = 0
) -> tuple[jax.Array, jax.Array]:
    """Batched greedy CTC: [B, T, V] log-probs -> (tokens [B, T], lens [B]).

    Collapses repeats then removes blanks; jit-safe (static shapes, output
    padded with blank).
    """
    bsz, t_max, _ = log_probs.shape
    best = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)      # [B, T]
    t_idx = jnp.arange(t_max)
    valid = t_idx[None, :] < lengths[:, None]
    prev = jnp.pad(best, ((0, 0), (1, 0)), constant_values=blank)[:, :t_max]
    keep = valid & (best != blank) & (best != prev)
    # Stable-compact kept tokens to the front.
    order = jnp.argsort(~keep, axis=1, stable=True)
    compacted = jnp.take_along_axis(best, order, axis=1)
    out_lens = jnp.sum(keep, axis=1).astype(jnp.int32)
    out = jnp.where(t_idx[None, :] < out_lens[:, None], compacted, blank)
    return out, out_lens


def ctc_greedy_decode(
    p: Params,
    encoder_out: jax.Array,
    encoder_out_lens: jax.Array,
    cfg: ModelConfig,
) -> tuple[jax.Array, jax.Array]:
    logits = ctc_head.ctc_logits(p["ctc"], encoder_out)
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return ctc_greedy_search(log_probs, encoder_out_lens, cfg.blank_id)


def _log_add(a: float, b: float) -> float:
    if a == _LOG_ZERO:
        return b
    if b == _LOG_ZERO:
        return a
    hi, lo = (a, b) if a > b else (b, a)
    return hi + math.log1p(math.exp(lo - hi))


def ctc_prefix_beam_search(
    log_probs: np.ndarray,
    length: int,
    beam_size: int = 8,
    blank: int = 0,
    top_k: int = 16,
) -> list[tuple[tuple[int, ...], float]]:
    """Prefix beam search over one utterance ([T, V] log-probs).

    Returns the beam as [(prefix, log_prob)] sorted best-first, where
    log_prob merges blank/non-blank endings.
    """
    log_probs = np.asarray(log_probs, np.float64)
    # beams: prefix -> (p_blank, p_nonblank)
    beams: dict[tuple[int, ...], tuple[float, float]] = {(): (0.0, _LOG_ZERO)}
    k = min(top_k, log_probs.shape[1])
    for t in range(length):
        frame = log_probs[t]
        cand = (
            np.argpartition(frame, -k)[-k:]
            if k < log_probs.shape[1]
            else np.arange(log_probs.shape[1])
        )
        next_beams: dict[tuple[int, ...], list[float]] = defaultdict(
            lambda: [_LOG_ZERO, _LOG_ZERO]
        )
        for prefix, (pb, pnb) in beams.items():
            p_total = _log_add(pb, pnb)
            last = prefix[-1] if prefix else None
            for v in cand:
                pv = float(frame[v])
                if v == blank:
                    nb = next_beams[prefix]
                    nb[0] = _log_add(nb[0], p_total + pv)
                elif v == last:
                    # repeat: extends the same prefix only via a blank gap
                    nb = next_beams[prefix]
                    nb[1] = _log_add(nb[1], pnb + pv)
                    ext = next_beams[prefix + (int(v),)]
                    ext[1] = _log_add(ext[1], pb + pv)
                else:
                    ext = next_beams[prefix + (int(v),)]
                    ext[1] = _log_add(ext[1], p_total + pv)
        scored = sorted(
            next_beams.items(),
            key=lambda kv: -_log_add(kv[1][0], kv[1][1]),
        )[:beam_size]
        beams = {k: (v[0], v[1]) for k, v in scored}
    return [
        (prefix, _log_add(pb, pnb)) for prefix, (pb, pnb) in sorted(
            beams.items(), key=lambda kv: -_log_add(kv[1][0], kv[1][1])
        )
    ]


def ctc_prefix_beam_decode(
    p: Params,
    encoder_out: jax.Array,
    encoder_out_lens: jax.Array,
    cfg: ModelConfig,
    beam_size: int = 8,
) -> list[list[int]]:
    """Batch wrapper: device log-probs -> host prefix beam per utterance."""
    logits = ctc_head.ctc_logits(p["ctc"], encoder_out)
    log_probs = np.asarray(
        jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    )
    lens = np.asarray(encoder_out_lens)
    out = []
    for i in range(log_probs.shape[0]):
        beam = ctc_prefix_beam_search(
            log_probs[i], int(lens[i]), beam_size, cfg.blank_id
        )
        out.append(list(beam[0][0]) if beam else [])
    return out
