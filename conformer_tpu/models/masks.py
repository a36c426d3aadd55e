"""Mask and sequence utilities (pure functions, jit-safe, static shapes).

Rebuilds the semantics of the reference mask kit (/root/reference/src/utils.py:
make_pad_mask :84-93, subsequent_chunk_mask :96-111, make_attn_mask :115-160,
make_subsequent_mask :163-168, add_blank :73-81, add_sos_eos :171-183) with
TPU-friendly constructions: no Python loops over sequence positions, chunk
sizes may be traced values (shapes stay static), randomness is explicit via
PRNG keys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_pad_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """True where a position is PADDING (matches reference make_pad_mask).

    Args:
        lengths: int array [B]
        max_len: static sequence length
    Returns:
        bool [B, max_len], True at t >= length.
    """
    pos = jnp.arange(max_len, dtype=lengths.dtype)
    return pos[None, :] >= lengths[:, None]


def make_non_pad_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """True where a position is VALID."""
    return ~make_pad_mask(lengths, max_len)


def subsequent_chunk_mask(
    size: int,
    chunk_size: jax.Array | int,
    num_left_chunks: jax.Array | int = -1,
) -> jax.Array:
    """Chunk-causal attention mask, True = may attend.

    Row i may attend to columns [start, (i//chunk + 1) * chunk) where
    start = max((i//chunk - num_left_chunks) * chunk, 0) (or 0 when
    num_left_chunks < 0). Matches reference subsequent_chunk_mask
    (src/utils.py:96-111) but accepts traced chunk sizes.
    """
    chunk_size = jnp.asarray(chunk_size, jnp.int32)
    num_left_chunks = jnp.asarray(num_left_chunks, jnp.int32)
    row = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
    row_chunk = row // chunk_size
    ending = (row_chunk + 1) * chunk_size
    start = jnp.where(
        num_left_chunks < 0,
        jnp.zeros_like(row_chunk),
        jnp.maximum((row_chunk - num_left_chunks) * chunk_size, 0),
    )
    return (col >= start) & (col < ending)


def make_subsequent_mask(length: int) -> jax.Array:
    """Lower-triangular causal mask, True = may attend (utils.py:163-168)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (length, length), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (length, length), 1)
    return col <= row


def sample_dynamic_chunk(
    rng: jax.Array, max_len: int, use_dynamic_left_chunk: bool
) -> tuple[jax.Array, jax.Array]:
    """Sample the training chunk size / left-chunk count.

    Reference logic (src/utils.py:126-137): draw U[1, max_len); if over
    max_len//2 use full context, else chunk = draw % 25 + 1 and, with dynamic
    left chunks, left = U[0, max_left_chunks).
    Returns (chunk_size, num_left_chunks) as traced int32 scalars.
    """
    k1, k2 = jax.random.split(rng)
    draw = jax.random.randint(k1, (), 1, max(max_len, 2))
    full = draw > max_len // 2
    chunk_size = jnp.where(full, max_len, draw % 25 + 1)
    if use_dynamic_left_chunk:
        left_draw = jax.random.randint(k2, (), 0, max(max_len - 1, 1))
        num_left = jnp.where(full, -1, left_draw)
    else:
        num_left = jnp.where(full, -1, -1)
    return chunk_size.astype(jnp.int32), num_left.astype(jnp.int32)


def make_attn_mask(
    pad_mask: jax.Array,
    *,
    use_dynamic_chunk: bool,
    use_dynamic_left_chunk: bool,
    decoding_chunk_size: int,
    static_chunk_size: int,
    num_decoding_left_chunks: int,
    rng: jax.Array | None = None,
) -> jax.Array:
    """Build the [B, T, T] attention mask (True = attend).

    Matches make_attn_mask (src/utils.py:115-160):
      - dynamic chunk training: per-batch random chunk size (rng required),
      - decoding_chunk_size > 0: fixed chunk (streaming decode),
      - decoding_chunk_size < 0: full context,
      - static_chunk_size > 0: fixed chunk without dynamic training,
      - else: pure padding mask.

    Args:
        pad_mask: bool [B, T], True = valid frame (non-pad).
    """
    bsz, max_len = pad_mask.shape
    valid = pad_mask[:, None, :]  # [B, 1, T] key-side padding
    if use_dynamic_chunk:
        if decoding_chunk_size < 0:
            chunk = jnp.asarray(max_len, jnp.int32)
            num_left = jnp.asarray(-1, jnp.int32)
        elif decoding_chunk_size > 0:
            chunk = jnp.asarray(decoding_chunk_size, jnp.int32)
            num_left = jnp.asarray(num_decoding_left_chunks, jnp.int32)
        else:
            if rng is None:
                raise ValueError("dynamic chunk training requires an rng key")
            chunk, num_left = sample_dynamic_chunk(
                rng, max_len, use_dynamic_left_chunk
            )
        chunk_masks = subsequent_chunk_mask(max_len, chunk, num_left)
        return valid & chunk_masks[None, :, :]
    if static_chunk_size > 0:
        chunk_masks = subsequent_chunk_mask(
            max_len, static_chunk_size, num_decoding_left_chunks
        )
        return valid & chunk_masks[None, :, :]
    return jnp.broadcast_to(valid, (bsz, max_len, max_len))


def add_blank(targets: jax.Array, blank: int, ignore_id: int) -> jax.Array:
    """Prepend blank and replace ignore_id with blank (utils.py:73-81).

    [B, U] int -> [B, U+1].
    """
    bsz = targets.shape[0]
    col = jnp.full((bsz, 1), blank, dtype=targets.dtype)
    out = jnp.concatenate([col, targets], axis=1)
    return jnp.where(out == ignore_id, blank, out)


def add_sos_eos(
    targets: jax.Array, lengths: jax.Array, sos: int, eos: int, ignore_id: int
) -> tuple[jax.Array, jax.Array]:
    """Static-shape add_sos_eos (utils.py:171-183).

    Given padded targets [B, U] (padded with ignore_id) and lengths [B],
    returns (ys_in [B, U+1] padded with eos, ys_out [B, U+1] padded with
    ignore_id) where ys_in = [sos, y...] and ys_out = [y..., eos].
    """
    bsz, u = targets.shape
    clean = jnp.where(targets == ignore_id, 0, targets)
    sos_col = jnp.full((bsz, 1), sos, dtype=targets.dtype)
    ys_in = jnp.concatenate([sos_col, clean], axis=1)
    pos = jnp.arange(u + 1)
    ys_in = jnp.where(pos[None, :] <= lengths[:, None], ys_in, eos)

    pad_col = jnp.zeros((bsz, 1), dtype=targets.dtype)
    ys_out = jnp.concatenate([clean, pad_col], axis=1)
    ys_out = jnp.where(
        pos[None, :] == lengths[:, None],
        eos,
        jnp.where(pos[None, :] < lengths[:, None], ys_out, ignore_id),
    )
    return ys_in, ys_out


def reverse_sequence(
    targets: jax.Array, lengths: jax.Array, ignore_id: int
) -> jax.Array:
    """Per-row reversal of the first `lengths` tokens (utils.py:186-190)."""
    bsz, u = targets.shape
    pos = jnp.arange(u)
    idx = lengths[:, None] - 1 - pos[None, :]
    gathered = jnp.take_along_axis(targets, jnp.maximum(idx, 0), axis=1)
    return jnp.where(pos[None, :] < lengths[:, None], gathered, ignore_id)


def subsample_pad_mask(pad_mask: jax.Array) -> jax.Array:
    """Pad-mask through the x4 conv subsampling: mask[:, 2::2][:, 2::2].

    Matches reference ConvolutionSubSampling.forward's mask slicing
    (src/convolution.py:76).
    """
    return pad_mask[:, 2::2][:, 2::2]


def subsampled_length(t: int) -> int:
    """Output length of the x4 subsampler for input length t (two valid
    stride-2 k=3 convs): ((t - 1) // 2 - 1) // 2."""
    return ((t - 1) // 2 - 1) // 2


def subsampled_lengths(lengths: jax.Array) -> jax.Array:
    return ((lengths - 1) // 2 - 1) // 2
