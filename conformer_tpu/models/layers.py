"""Primitive layers: explicit parameter pytrees + pure apply functions.

Design: every module is a pair of functions
    init_foo(rng, ...) -> params (a dict pytree of jnp arrays)
    foo(params, x, ...) -> y
This keeps the whole model a pure function of (params, inputs, rng), which is
what pjit/scan/vjp want, and makes checkpoint-import name mapping explicit.

Initializers follow torch defaults (Linear/Conv: U(-1/sqrt(fan_in),
1/sqrt(fan_in)) for weight and bias) so trainings are comparable to the
reference recipe (src/*.py uses torch defaults everywhere except the
attention pos biases which use xavier_uniform, src/attention.py:52-53).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


# ---------------------------------------------------------------- initializers


def _uniform(rng, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(rng, shape, dtype, -bound, bound)


def init_dense(rng, in_dim: int, out_dim: int, use_bias: bool = True) -> Params:
    kw, kb = jax.random.split(rng)
    bound = 1.0 / math.sqrt(in_dim)
    p: Params = {"kernel": _uniform(kw, (in_dim, out_dim), bound)}
    if use_bias:
        p["bias"] = _uniform(kb, (out_dim,), bound)
    return p


def init_embedding(rng, vocab: int, dim: int) -> Params:
    # torch nn.Embedding default: N(0, 1)
    return {"embedding": jax.random.normal(rng, (vocab, dim), jnp.float32)}


def init_layer_norm(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def init_batch_norm(dim: int) -> Params:
    return {
        "scale": jnp.ones((dim,), jnp.float32),
        "bias": jnp.zeros((dim,), jnp.float32),
        "mean": jnp.zeros((dim,), jnp.float32),
        "var": jnp.ones((dim,), jnp.float32),
    }


def init_conv1d(
    rng, in_ch: int, out_ch: int, kernel: int, groups: int = 1, use_bias: bool = True
) -> Params:
    kw, kb = jax.random.split(rng)
    fan_in = (in_ch // groups) * kernel
    bound = 1.0 / math.sqrt(fan_in)
    # Stored as [kernel, in_ch//groups, out_ch] (HWIO-like for lax conv).
    p: Params = {"kernel": _uniform(kw, (kernel, in_ch // groups, out_ch), bound)}
    if use_bias:
        p["bias"] = _uniform(kb, (out_ch,), bound)
    return p


def init_conv2d(
    rng, in_ch: int, out_ch: int, kernel: tuple[int, int], use_bias: bool = True
) -> Params:
    kw, kb = jax.random.split(rng)
    fan_in = in_ch * kernel[0] * kernel[1]
    bound = 1.0 / math.sqrt(fan_in)
    p: Params = {"kernel": _uniform(kw, (*kernel, in_ch, out_ch), bound)}
    if use_bias:
        p["bias"] = _uniform(kb, (out_ch,), bound)
    return p


# ---------------------------------------------------------------------- apply


def dense(p: Params, x: jax.Array) -> jax.Array:
    if "kernel_q" in p:
        # int8-quantized serving params (ops/quant.py): int8 MXU matmul.
        from ..ops.quant import int8_dense

        return int8_dense(p, x)
    y = jnp.dot(x, p["kernel"].astype(x.dtype), preferred_element_type=x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def embedding(p: Params, ids: jax.Array, dtype=None) -> jax.Array:
    table = p["embedding"]
    if dtype is not None:
        table = table.astype(dtype)
    return jnp.take(table, ids, axis=0)


def layer_norm(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    # Statistics in fp32 regardless of activation dtype.
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def batch_norm_inference(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Apply batch norm with running statistics (channel-last)."""
    xf = x.astype(jnp.float32)
    y = (xf - p["mean"]) * jax.lax.rsqrt(p["var"] + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def batch_norm_train(
    p: Params, x: jax.Array, mask: jax.Array | None = None, eps: float = 1e-5,
    momentum: float = 0.1,
) -> tuple[jax.Array, Params]:
    """Batch norm over (batch, time) for [B, T, C]; returns (y, new_stats).

    Only used in reference-parity mode (conv_norm="batch_norm"); masked frames
    are excluded from the statistics.
    """
    xf = x.astype(jnp.float32)
    if mask is not None:
        m = mask.astype(jnp.float32)[..., None]
        n = jnp.maximum(jnp.sum(m), 1.0)
        mean = jnp.sum(xf * m, axis=(0, 1)) / n
        var = jnp.sum(jnp.square(xf - mean) * m, axis=(0, 1)) / n
    else:
        mean = jnp.mean(xf, axis=(0, 1))
        var = jnp.var(xf, axis=(0, 1))
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    new_stats = dict(p)
    new_stats["mean"] = (1 - momentum) * p["mean"] + momentum * mean
    new_stats["var"] = (1 - momentum) * p["var"] + momentum * var
    return y.astype(x.dtype), new_stats


def conv1d(
    p: Params,
    x: jax.Array,
    *,
    stride: int = 1,
    padding: int | tuple[int, int] = 0,
    groups: int = 1,
) -> jax.Array:
    """1D conv over [B, T, C] with kernel [K, C//groups, O]."""
    if isinstance(padding, int):
        padding = (padding, padding)
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(stride,),
        padding=[padding],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def conv2d(
    p: Params,
    x: jax.Array,
    *,
    stride: tuple[int, int] = (1, 1),
    padding: str | tuple = "VALID",
) -> jax.Array:
    """2D conv over [B, H, W, C] with kernel [Kh, Kw, I, O]."""
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def dropout(
    rng: jax.Array | None, x: jax.Array, rate: float, deterministic: bool
) -> jax.Array:
    if deterministic or rate <= 0.0:
        return x
    assert rng is not None, "dropout in train mode needs an rng"
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def glu(x: jax.Array, axis: int = -1) -> jax.Array:
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


def swish(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)
