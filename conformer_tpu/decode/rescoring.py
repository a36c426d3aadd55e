"""Attention rescoring: CTC prefix-beam n-best re-scored by the attention
decoder (L2R + optional R2L).

The standard hybrid decode mode the reference's (dead) attention decoder was
meant for: score = decoder_log_prob + ctc_weight * ctc_prefix_log_prob,
with the R2L decoder blended by reverse_weight when present.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models import decoder as decoder_mod
from ..models import masks
from ..models.layers import Params
from .ctc_decode import ctc_prefix_beam_search
from ..models import ctc_head


def _decoder_score(
    dec_params: Params,
    memory: jax.Array,
    memory_mask: jax.Array,
    hyp: list[int],
    cfg: ModelConfig,
    reverse: bool = False,
) -> float:
    """Sum log P(hyp + eos | memory) under one decoder direction."""
    tokens = list(reversed(hyp)) if reverse else hyp
    u = len(tokens)
    labels = jnp.asarray([tokens], jnp.int32) if u else jnp.zeros((1, 0), jnp.int32)
    lens = jnp.asarray([u], jnp.int32)
    ys_in, ys_out = masks.add_sos_eos(
        labels, lens, cfg.sos_eos_id, cfg.sos_eos_id, cfg.ignore_id
    )
    logits = decoder_mod.transformer_decoder_forward(
        dec_params, memory, memory_mask, ys_in, lens + 1, cfg
    )
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)[0]
    score = 0.0
    out = np.asarray(ys_out[0])
    lp = np.asarray(logp)
    for pos in range(u + 1):
        score += float(lp[pos, out[pos]])
    return score


def attention_rescoring(
    p: Params,
    encoder_out: jax.Array,
    encoder_out_lens: jax.Array,
    cfg: ModelConfig,
    *,
    beam_size: int = 8,
    ctc_weight: float = 0.5,
) -> list[list[int]]:
    """Batched (host loop) attention rescoring decode.

    Requires params with a "decoder" subtree (cfg.decoder_num_layers > 0).
    """
    if "decoder" not in p:
        raise ValueError("attention_rescoring needs an attention decoder head")
    logits = ctc_head.ctc_logits(p["ctc"], encoder_out)
    log_probs = np.asarray(jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1))
    lens = np.asarray(encoder_out_lens)
    results = []
    left = p["decoder"]["left_decoder"]
    right = p["decoder"].get("right_decoder")
    for i in range(encoder_out.shape[0]):
        nbest = ctc_prefix_beam_search(
            log_probs[i], int(lens[i]), beam_size, cfg.blank_id
        )
        memory = encoder_out[i : i + 1, : int(lens[i])]
        memory_mask = jnp.ones((1, int(lens[i])), bool)
        best_hyp: list[int] = []
        best_score = -float("inf")
        for prefix, ctc_score in nbest:
            hyp = list(prefix)
            score = _decoder_score(left, memory, memory_mask, hyp, cfg)
            if right is not None and cfg.reverse_weight > 0:
                r_score = _decoder_score(
                    right, memory, memory_mask, hyp, cfg, reverse=True
                )
                score = (
                    (1 - cfg.reverse_weight) * score + cfg.reverse_weight * r_score
                )
            score += ctc_weight * ctc_score
            if score > best_score:
                best_score = score
                best_hyp = hyp
        results.append(best_hyp)
    return results
