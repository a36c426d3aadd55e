"""Attention rescoring: CTC prefix-beam n-best re-scored by the attention
decoder (L2R + optional R2L).

The standard hybrid decode mode the reference's (dead) attention decoder was
meant for: score = decoder_log_prob + ctc_weight * ctc_prefix_log_prob,
with the R2L decoder blended by reverse_weight when present.

The decoder scorer is a single batched, jitted device call over all
(utterance, hypothesis) pairs — [B*K, U] through one transformer-decoder
forward on the MXU — not a per-hypothesis host loop. Only the CTC prefix
beam itself (inherently sequential, tiny) stays on host.
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

# jit cache for the batched scorer, keyed by the (hashable) config repr and
# direction — ModelConfig is an unfrozen dataclass, so it can't be a static
# jit argument directly.
_SCORER_CACHE: dict[tuple[str, bool], object] = {}


def batched_decoder_scores(
    dec_params: Params,
    memory: jax.Array,
    memory_mask: jax.Array,
    hyps: jax.Array,
    hyp_lens: jax.Array,
    cfg: ModelConfig,
    *,
    reverse: bool = False,
) -> jax.Array:
    """Sum log P(hyp + eos | memory) for a batch of hypotheses.

    Args:
        memory: [N, T, D] encoder output (one row per hypothesis — tile the
            utterance's memory across its n-best).
        memory_mask: [N, T] bool pad mask.
        hyps: [N, U] token ids (padding value irrelevant); hyp_lens: [N].
        reverse: score the per-row reversed hypothesis (R2L decoder).
    Returns:
        [N] float32 scores.
    """
    if reverse:
        hyps = masks.reverse_sequence(hyps, hyp_lens, cfg.ignore_id)
    ys_in, ys_out = masks.add_sos_eos(
        hyps, hyp_lens, cfg.sos_eos_id, cfg.sos_eos_id, cfg.ignore_id
    )
    logits = decoder_mod.transformer_decoder_forward(
        dec_params, memory, memory_mask, ys_in, hyp_lens + 1, cfg
    )
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.where(ys_out == cfg.ignore_id, 0, ys_out)
    pick = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    u1 = hyps.shape[1] + 1
    valid = jnp.arange(u1)[None, :] <= hyp_lens[:, None]  # tokens + eos
    return jnp.sum(jnp.where(valid, pick, 0.0), axis=-1)


def _jitted_scorer(cfg: ModelConfig, reverse: bool):
    key = (repr(cfg), reverse)
    fn = _SCORER_CACHE.get(key)
    if fn is None:
        fn = jax.jit(
            lambda dp, mem, mm, hy, hl: batched_decoder_scores(
                dp, mem, mm, hy, hl, cfg, reverse=reverse
            )
        )
        _SCORER_CACHE[key] = fn
    return fn


def attention_rescoring(
    p: Params,
    encoder_out: jax.Array,
    encoder_out_lens: jax.Array,
    cfg: ModelConfig,
    *,
    beam_size: int = 8,
    ctc_weight: float = 0.5,
    max_hyp_len: int = 64,
) -> list[list[int]]:
    """Attention-rescored CTC prefix-beam decode for a batch.

    Host computes the n-best per utterance (sequential prefix beam); the
    decoder then scores all B*beam_size hypotheses in ONE jitted batched
    forward per direction. Requires params with a "decoder" subtree
    (cfg.decoder_num_layers > 0).
    """
    if "decoder" not in p:
        raise ValueError("attention_rescoring needs an attention decoder head")
    logits = ctc_head.ctc_logits(p["ctc"], encoder_out)
    log_probs = np.asarray(jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1))
    lens = np.asarray(encoder_out_lens)
    bsz, t_max, _ = encoder_out.shape

    # Host: n-best per utterance. Pad the hypothesis grid to static shapes.
    nbests: list[list[tuple[tuple[int, ...], float]]] = [
        ctc_prefix_beam_search(log_probs[i], int(lens[i]), beam_size, cfg.blank_id)
        for i in range(bsz)
    ]
    n = beam_size
    hyps = np.zeros((bsz * n, max_hyp_len), np.int32)
    hyp_lens = np.zeros((bsz * n,), np.int32)
    ctc_scores = np.full((bsz, n), -np.inf, np.float64)
    for i, nbest in enumerate(nbests):
        for j, (prefix, score) in enumerate(nbest[:n]):
            prefix = prefix[:max_hyp_len]
            hyps[i * n + j, : len(prefix)] = prefix
            hyp_lens[i * n + j] = len(prefix)
            ctc_scores[i, j] = score

    # Device: one batched decoder forward per direction over all B*K rows.
    memory = jnp.repeat(encoder_out, n, axis=0)                    # [B*K, T, D]
    memory_mask = jnp.repeat(
        jnp.arange(t_max)[None, :] < encoder_out_lens[:, None], n, axis=0
    )
    scorer = _jitted_scorer(cfg, False)
    dec_scores = np.asarray(
        scorer(p["decoder"]["left_decoder"], memory, memory_mask,
               jnp.asarray(hyps), jnp.asarray(hyp_lens))
    ).reshape(bsz, n)
    right = p["decoder"].get("right_decoder")
    if right is not None and cfg.reverse_weight > 0:
        r_scores = np.asarray(
            _jitted_scorer(cfg, True)(
                right, memory, memory_mask,
                jnp.asarray(hyps), jnp.asarray(hyp_lens),
            )
        ).reshape(bsz, n)
        dec_scores = (
            (1 - cfg.reverse_weight) * dec_scores + cfg.reverse_weight * r_scores
        )

    total = dec_scores + ctc_weight * ctc_scores  # -inf rows (absent hyps) lose
    results = []
    for i in range(bsz):
        j = int(np.argmax(total[i]))
        results.append(list(map(int, hyps[i * n + j, : hyp_lens[i * n + j]])))
    return results


def attention_rescoring_batch(
    p: Params,
    encoder_out: jax.Array,
    encoder_out_lens: jax.Array,
    cfg: ModelConfig,
    *,
    beam_size: int = 8,
    ctc_weight: float = 0.5,
    max_hyp_len: int = 64,
    top_c: int = 16,
) -> tuple[jax.Array, jax.Array]:
    """Fully device-side attention rescoring: one jittable computation.

    Replaces the host-assisted `attention_rescoring`: the n-best comes from
    the batched device CTC prefix beam (decode/ctc_beam_batched.py) instead
    of a per-utterance host loop, and the winner selection stays on device,
    so the whole decode — encoder output to final hypotheses — jits and
    shards with the batch. Parity with the host path is tested in
    tests/test_ctc_beam_batched.py.

    Returns (hyps [B, max_hyp_len] blank-padded, lens [B]).
    """
    from .ctc_beam_batched import ctc_prefix_beam_decode_batch

    bsz, t_max, _ = encoder_out.shape
    n = beam_size
    toks, lens, ctc_scores = ctc_prefix_beam_decode_batch(
        p, encoder_out, encoder_out_lens, cfg,
        beam_size=n, max_hyp_len=max_hyp_len, top_c=top_c,
    )                                                        # [B,K,L],[B,K]

    hyps = toks.reshape(bsz * n, max_hyp_len)
    hyp_lens = lens.reshape(bsz * n)
    memory = jnp.repeat(encoder_out, n, axis=0)              # [B*K, T, D]
    memory_mask = jnp.repeat(
        jnp.arange(t_max)[None, :] < encoder_out_lens[:, None], n, axis=0
    )
    dec_scores = batched_decoder_scores(
        p["decoder"]["left_decoder"], memory, memory_mask, hyps, hyp_lens,
        cfg,
    ).reshape(bsz, n)
    right = p["decoder"].get("right_decoder")
    if right is not None and cfg.reverse_weight > 0:
        r_scores = batched_decoder_scores(
            right, memory, memory_mask, hyps, hyp_lens, cfg, reverse=True
        ).reshape(bsz, n)
        dec_scores = (
            (1 - cfg.reverse_weight) * dec_scores
            + cfg.reverse_weight * r_scores
        )

    total = dec_scores + ctc_weight * ctc_scores
    # dead beam slots (ctc score ~ -1e30) must never win, even at
    # ctc_weight == 0 where the decoder score alone is finite
    total = jnp.where(ctc_scores < -1e29, -jnp.inf, total)
    best = jnp.argmax(total, axis=1)                         # [B]
    out_toks = jnp.take_along_axis(toks, best[:, None, None], axis=1)[:, 0]
    out_lens = jnp.take_along_axis(lens, best[:, None], axis=1)[:, 0]
    return out_toks, out_lens
