"""Streaming (chunked) decoding: jitted scan + stateful session API.

Rebuilds the reference's three streaming paths (SURVEY.md §3.2/§3.3):
  - greedy_search_streaming_eval (model.py:126-165): chunk-simulated eval
    over a full utterance — here a single `lax.scan` over a static chunk
    grid, fully batched and jit-able;
  - greedy_search_streaming_app + init_state (model.py:167-199): true
    stateful streaming for live audio — here an immutable StreamingSession
    pytree (no global mutable model state, fixing the concurrency race noted
    in SURVEY.md §5.2);
  - the chunk window arithmetic (stride = 4*chunk, window = 4*(chunk-1)+7,
    encoder.py:129-132) is shared via models.encoder.chunk_window_params.

Reference quirk handled: streaming_eval resets the predictor cache every
chunk (model.py:155-160) while the app path carries it (model.py:189-195).
We carry by default; `reset_predictor_per_chunk=True` reproduces eval parity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..models import encoder as encoder_mod
from ..models.encoder import EncoderState
from ..models.layers import Params
from ..models.masks import subsampled_lengths
from .greedy import GreedyState, greedy_search_batch, init_greedy_state


def streaming_greedy_search(
    p: Params,
    feats: jax.Array,
    feat_lengths: jax.Array,
    cfg: ModelConfig,
    *,
    decoding_chunk_size: int,
    num_decoding_left_chunks: int = -1,
    max_cache_size: int = 512,
    n_steps: int = 64,
    max_hyp_len: int = 256,
    reset_predictor_per_chunk: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Chunk-simulated streaming eval over whole utterances, batched + jitted.

    Args:
        feats: [B, T, F]; feat_lengths: [B].
        decoding_chunk_size: chunk size in SUBSAMPLED frames.
        num_decoding_left_chunks: left context chunks (-1 = unlimited up to
            max_cache_size).
    Returns:
        (hyps [B, max_hyp_len], hyp_lens [B]).
    """
    stride, window, context = encoder_mod.chunk_window_params(decoding_chunk_size)
    bsz, t_total, f = feats.shape
    if t_total < context:
        raise ValueError(f"utterance shorter than subsampling context ({context})")
    num_chunks = (t_total - context) // stride + 1
    pad_to = (num_chunks - 1) * stride + window
    if pad_to > t_total:
        feats = jnp.pad(feats, ((0, 0), (0, pad_to - t_total), (0, 0)))

    cache_size = (
        decoding_chunk_size * num_decoding_left_chunks
        if num_decoding_left_chunks >= 0
        else max_cache_size
    )
    enc_state = encoder_mod.init_encoder_state(cfg, bsz, cache_size)
    dec_state = init_greedy_state(p, cfg, bsz)
    # Valid subsampled frames per utterance.
    out_lens_total = subsampled_lengths(feat_lengths)

    class Carry(NamedTuple):
        enc: EncoderState
        dec: GreedyState
        hyps: jax.Array
        hyp_len: jax.Array

    init = Carry(
        enc=enc_state,
        dec=dec_state,
        hyps=jnp.full((bsz, max_hyp_len), cfg.blank_id, jnp.int32),
        hyp_len=jnp.zeros((bsz,), jnp.int32),
    )

    def step(c: Carry, chunk_idx):
        start = chunk_idx * stride
        chunk = jax.lax.dynamic_slice_in_dim(feats, start, window, axis=1)
        enc_out, enc_state = encoder_mod.encoder_forward_chunk(
            p["encoder"], chunk, c.enc, cfg, cmvn=p.get("cmvn")
        )
        # Frames of this chunk that are within the utterance:
        chunk_out_start = chunk_idx * decoding_chunk_size
        valid = jnp.clip(out_lens_total - chunk_out_start, 0, enc_out.shape[1])
        dec_in = c.dec
        if reset_predictor_per_chunk:
            dec_in = init_greedy_state(p, cfg, bsz)
        hyps, hyp_len, dec_state = greedy_search_batch(
            p, enc_out, valid, cfg,
            state=dec_in, n_steps=n_steps, max_hyp_len=max_hyp_len,
            hyps_init=c.hyps, hyp_len_init=c.hyp_len,
        )
        return Carry(enc=enc_state, dec=dec_state, hyps=hyps, hyp_len=hyp_len), None

    final, _ = jax.lax.scan(step, init, jnp.arange(num_chunks))
    return final.hyps, final.hyp_len


# ------------------------------------------------------------ live sessions


class StreamingSession(NamedTuple):
    """Immutable per-connection streaming state (replaces the reference's
    mutable module attributes, model.py:56-62/:167-174)."""

    enc: EncoderState
    dec: GreedyState
    hyps: jax.Array      # [1, max_hyp_len]
    hyp_len: jax.Array   # [1]


def new_session(
    p: Params, cfg: ModelConfig, *, cache_size: int = 512, max_hyp_len: int = 1024
) -> StreamingSession:
    """Fresh session (reference init_state, model.py:167-174)."""
    return StreamingSession(
        enc=encoder_mod.init_encoder_state(cfg, 1, cache_size),
        dec=init_greedy_state(p, cfg, 1),
        hyps=jnp.full((1, max_hyp_len), cfg.blank_id, jnp.int32),
        hyp_len=jnp.zeros((1,), jnp.int32),
    )


def session_accept_chunk(
    p: Params,
    session: StreamingSession,
    chunk_feats: jax.Array,
    cfg: ModelConfig,
    *,
    n_steps: int = 64,
) -> StreamingSession:
    """Process one chunk of feature frames [1, Tc, F]; returns the new
    session (reference greedy_search_streaming_app, model.py:177-199)."""
    enc_out, enc_state = encoder_mod.encoder_forward_chunk(
        p["encoder"], chunk_feats, session.enc, cfg, cmvn=p.get("cmvn")
    )
    lens = jnp.full((1,), enc_out.shape[1], jnp.int32)
    hyps, hyp_len, dec_state = greedy_search_batch(
        p, enc_out, lens, cfg,
        state=session.dec, n_steps=n_steps,
        max_hyp_len=session.hyps.shape[1],
        hyps_init=session.hyps, hyp_len_init=session.hyp_len,
    )
    return StreamingSession(enc=enc_state, dec=dec_state, hyps=hyps, hyp_len=hyp_len)
