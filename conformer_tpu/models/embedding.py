"""Sinusoidal positional encodings (absolute + relative).

Reference: /root/reference/src/attention.py:6-29 (RelativePositionalEncoding)
and :105-127 (PositionalEncoding). Differences by design:
  - tables are fp32 (the reference's absolute table is fp16, a quirk),
  - the relative table covers signed distances [-(max_len-1), max_len-1] so
    attention can use true Transformer-XL relative distances, which are
    translation-invariant and therefore streaming-cache friendly. The
    reference instead indexes absolute key positions (and, during batched
    training, degenerately slices by batch index — attention.py:86 with a
    [T,1,d] table viewed as [B,...]); we do not reproduce that bug.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sinusoid_table(max_len: int, d_model: int) -> jax.Array:
    """Absolute sinusoidal table [max_len, d] (positions 0..max_len-1)."""
    pos = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-jnp.log(10000.0) / d_model)
    )
    pe = jnp.zeros((max_len, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe


def signed_sinusoid_table(max_len: int, d_model: int) -> jax.Array:
    """Relative-distance table [2*max_len-1, d].

    Row r encodes distance d = max_len - 1 - r, i.e. row 0 is the largest
    positive distance (query far ahead of key) descending to -(max_len-1).
    sin/cos are evaluated at the signed distance.
    """
    dist = (max_len - 1) - jnp.arange(2 * max_len - 1, dtype=jnp.float32)
    div = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-jnp.log(10000.0) / d_model)
    )
    pe = jnp.zeros((2 * max_len - 1, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(dist[:, None] * div))
    pe = pe.at[:, 1::2].set(jnp.cos(dist[:, None] * div))
    return pe


def absolute_pos_embed(
    table: jax.Array, offset: jax.Array | int, size: int
) -> jax.Array:
    """table[offset : offset+size] with a traced offset (static size)."""
    offset = jnp.asarray(offset, jnp.int32)
    return jax.lax.dynamic_slice_in_dim(table, offset, size, axis=0)


def abs_pos_vectors(positions: jax.Array, d_model: int) -> jax.Array:
    """pe(pos) rows for arbitrary (traced, possibly negative) integer
    positions [P] -> [P, d_model], sin at even dims / cos at odd dims.

    Used by the reference-parity attention modes (rel_mode="ref_abs" /
    "ref_batch"), which reproduce the reference's raw absolute-position
    matrix_bd (/root/reference/src/attention.py:80-86) for checkpoint-parity
    evaluation.
    """
    pos = jnp.asarray(positions, jnp.float32)[:, None]
    div = rel_freqs(d_model)[None, :]
    pe = jnp.zeros((pos.shape[0], d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe


def rel_freqs(d_model: int) -> jax.Array:
    """The K = d_model/2 sinusoid angular frequencies omega_k."""
    return jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-jnp.log(10000.0) / d_model)
    )


def relative_pos_embed(table: jax.Array, q_len: int, k_len: int) -> jax.Array:
    """Slice of the signed table for (q_len, k_len) attention.

    Returns [q_len + k_len - 1, d] covering distances k_len-1 .. -(q_len-1)
    in descending order. Assumes keys end where queries end (self-attention
    with a left cache of k_len - q_len frames).
    """
    max_len = (table.shape[0] + 1) // 2
    start = max_len - k_len
    return jax.lax.dynamic_slice_in_dim(table, start, q_len + k_len - 1, axis=0)
