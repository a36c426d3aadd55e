"""Conformer convolution module + conv subsampling.

Rebuilds /root/reference/src/convolution.py (ConvolutionModule :5-49,
ConvolutionSubSampling :52-79) as pure functions. Design deltas (SURVEY.md
§5.7 "fix by default, flag for parity"):
  - a REAL conv cache: the last (kernel-1) frames are carried across chunks
    (the reference threads a cnn_cache through the API but always returns an
    empty one, giving zero left context at chunk boundaries),
  - default norm is LayerNorm (streaming-safe); BatchNorm1d parity mode is
    available with running stats,
  - optional causal depthwise conv for exact streaming equivalence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers
from .layers import Params


def init_conv_module(
    rng, dim: int, kernel_size: int, norm_type: str = "layer_norm"
) -> Params:
    k1, k2, k3 = jax.random.split(rng, 3)
    p: Params = {
        "pointwise_conv1": layers.init_conv1d(k1, dim, dim * 2, 1),
        "depthwise_conv": layers.init_conv1d(k2, dim, dim, kernel_size, groups=dim),
        "pointwise_conv2": layers.init_conv1d(k3, dim, dim, 1),
    }
    if norm_type == "batch_norm":
        p["norm"] = layers.init_batch_norm(dim)
    else:
        p["norm"] = layers.init_layer_norm(dim)
    return p


def conv_module(
    p: Params,
    x: jax.Array,
    pad_mask: jax.Array | None,
    *,
    kernel_size: int,
    norm_type: str = "layer_norm",
    causal: bool = False,
    cache: jax.Array | None = None,
    deterministic: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Conformer conv block: pw-expand -> GLU -> depthwise -> norm -> SiLU -> pw.

    Args:
        x: [B, T, D]; pad_mask: bool [B, T] True = valid frame (or None).
        cache: [B, kernel_size-1, D] left context from the previous chunk
            (zeros for the first chunk), or None for full-utterance mode.
    Returns:
        (y [B, T, D], new_cache [B, kernel_size-1, D]).
        In full-utterance mode new_cache is the trailing kernel_size-1 frames
        (handy for switching to streaming); padding frames are zeroed first,
        matching the reference's masked_fill (src/convolution.py:36).
    """
    if pad_mask is not None:
        x = jnp.where(pad_mask[..., None], x, jnp.zeros_like(x))

    y = layers.conv1d(p["pointwise_conv1"], x)          # [B, T, 2D]
    y = layers.glu(y, axis=-1)

    context = kernel_size - 1
    channels = y.shape[-1]
    if cache is not None:
        y_ext = jnp.concatenate([cache.astype(y.dtype), y], axis=1)
        # Next-chunk cache = trailing `context` frames of the FULL history
        # (the chunk may be shorter than the conv context).
        new_cache = (
            y_ext[:, -context:, :]
            if context > 0
            else jnp.zeros((y.shape[0], 0, channels), y.dtype)
        )
        if causal:
            pad = (0, 0)
        else:
            # Left context comes from the cache; the chunk's right edge is
            # zero-padded (future frames unavailable in streaming).
            pad = (0, context // 2)
            if context // 2 > 0:
                y_ext = y_ext[:, context // 2:, :]
        y = layers.conv1d(p["depthwise_conv"], y_ext, padding=pad, groups=channels)
    else:
        # Full-utterance: next-chunk cache = trailing `context` frames,
        # zero-left-padded if the utterance is shorter than the context.
        if context > 0:
            y_pad = jnp.pad(y, ((0, 0), (context, 0), (0, 0)))
            new_cache = y_pad[:, -context:, :]
        else:
            new_cache = jnp.zeros((y.shape[0], 0, channels), y.dtype)
        pad = (context, 0) if causal else (context // 2, context - context // 2)
        y = layers.conv1d(p["depthwise_conv"], y, padding=pad, groups=channels)

    if norm_type == "batch_norm":
        y = layers.batch_norm_inference(p["norm"], y)
    else:
        y = layers.layer_norm(p["norm"], y)
    y = layers.swish(y)
    y = layers.conv1d(p["pointwise_conv2"], y)

    if pad_mask is not None:
        y = jnp.where(pad_mask[..., None], y, jnp.zeros_like(y))
    return y, new_cache


def init_subsampling(rng, input_dim: int, output_dim: int) -> Params:
    """x4 conv subsampling (two valid k=3 s=2 Conv2d) + linear projection.

    Matches reference ConvolutionSubSampling (src/convolution.py:52-79):
    freq dim shrinks input_dim -> ((input_dim-1)//2 - 1)//2.
    """
    k1, k2, k3 = jax.random.split(rng, 3)
    freq_out = ((input_dim - 1) // 2 - 1) // 2
    return {
        "conv1": layers.init_conv2d(k1, 1, output_dim, (3, 3)),
        "conv2": layers.init_conv2d(k2, output_dim, output_dim, (3, 3)),
        "out": layers.init_dense(k3, output_dim * freq_out, output_dim),
    }


def subsampling(p: Params, x: jax.Array) -> jax.Array:
    """[B, T, F] features -> [B, T', D] with T' = ((T-1)//2 - 1)//2.

    Note the reference flattens conv output as [T', C * F'] with the channel
    axis MAJOR (view of a [B, T', C, F'] tensor, src/convolution.py:75); we
    match that layout so checkpoints map 1:1.
    """
    y = x[..., None]                                    # [B, T, F, 1]
    y = jax.nn.relu(layers.conv2d(p["conv1"], y, stride=(2, 2)))
    y = jax.nn.relu(layers.conv2d(p["conv2"], y, stride=(2, 2)))
    b, t, f, c = y.shape
    y = y.transpose(0, 1, 3, 2).reshape(b, t, c * f)    # channel-major flatten
    return layers.dense(p["out"], y)
