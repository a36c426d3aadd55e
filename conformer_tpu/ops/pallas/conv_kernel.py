"""Fused Conformer convolution block Pallas kernel (inference forward).

One VMEM pass per batch row over the whole conv sub-block of an encoder
layer (reference src/convolution.py:5-49 + the surrounding pre-norm and
residual, src/encoder_layer.py:57-60):

    out = x + pw2(swish(ln(depthwise(glu(pw1(ln_pre(x)))))))

The XLA path round-trips HBM between each stage (7 elementwise passes +
2 small matmuls over [B, T, D]); here the sequence stays resident — the
depthwise k-tap conv is k shifted fused multiply-adds on the VPU and the
two pointwise convs are MXU matmuls.

Inference path only (deterministic, full-utterance, layer_norm, non-causal
— the flagship decode configuration); training and streaming keep the
modular XLA path. Also emits the trailing (k-1) GLU frames so callers can
switch to streaming with a warm conv cache (convolution.conv_module
contract)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._compat import resolve_interpret


def _ln(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _conv_kernel(
    len_ref,    # [1, 1, 1] int32
    x_ref,      # [1, Tp, D]
    pre_s_ref,  # [1, D] pre-norm scale
    pre_b_ref,  # [1, D]
    w1_ref,     # [D, 2D]
    b1_ref,     # [1, 2D]
    wd_ref,     # [K, D] depthwise taps
    bd_ref,     # [1, D]
    ln_s_ref,   # [1, D]
    ln_b_ref,   # [1, D]
    w2_ref,     # [D, D]
    b2_ref,     # [1, D]
    out_ref,    # [1, Tp, D]
    cache_ref,  # [1, K-1, D] trailing GLU frames
    *,
    kernel_size: int,
    t_orig: int,
):
    tp, d = x_ref.shape[1], x_ref.shape[2]
    k = kernel_size
    ctx = k - 1
    length = len_ref[0, 0, 0]
    row = jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)
    valid = row < length                                     # [Tp, 1]

    x = x_ref[0]
    y = _ln(x, pre_s_ref[0], pre_b_ref[0])                   # pre-norm, f32
    # masked_fill before the module (reference convolution.py:36)
    y = jnp.where(valid, y, 0.0).astype(x.dtype)

    h = jax.lax.dot_general(
        y, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0][None, :]                                   # [Tp, 2D]
    glu = h[:, :d] * jax.nn.sigmoid(h[:, d:])                # [Tp, D] f32
    # rows in [t_orig, Tp) exist only because of the sublane pad; the XLA
    # path's depthwise conv sees true zeros there (frames in
    # [length, t_orig) keep their bias-GLU values, like the XLA path)
    glu = jnp.where(row < t_orig, glu, 0.0)

    # depthwise conv, SAME padding (ctx//2 left, ctx - ctx//2 right):
    # k shifted FMAs over a zero-padded copy
    gpad = jnp.pad(glu, ((ctx // 2, ctx - ctx // 2), (0, 0)))
    acc = jnp.zeros((tp, d), jnp.float32)
    for tap in range(k):
        acc = acc + gpad[tap:tap + tp, :] * wd_ref[tap][None, :]
    acc = acc + bd_ref[0][None, :]

    z = _ln(acc, ln_s_ref[0], ln_b_ref[0])                   # f32
    z = z * jax.nn.sigmoid(z)                                # swish
    z = jax.lax.dot_general(
        z.astype(x.dtype), w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0][None, :]
    z = jnp.where(valid, z, 0.0)                             # final pad mask
    out_ref[0] = (x.astype(jnp.float32) + z).astype(out_ref.dtype)

    # streaming-warmup cache: trailing ctx GLU frames at the ORIGINAL T
    # (zero-left-padded when T < ctx), matching conv_module's full-utterance
    # return.
    gp2 = jnp.pad(glu, ((ctx, 0), (0, 0)))
    cache_ref[0] = gp2[t_orig:t_orig + ctx, :].astype(cache_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("kernel_size", "interpret")
)
def conv_block_fused(
    x: jax.Array,          # [B, T, D]
    lengths: jax.Array,    # [B] valid frames
    p_norm: dict,          # pre-norm layer_norm params
    p_conv: dict,          # conv module params
    *,
    kernel_size: int,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """x + conv_module(layer_norm(x)) fused; returns (out, conv_cache)."""
    interpret = resolve_interpret(interpret)
    b, t, d = x.shape
    ctx = kernel_size - 1
    pad_t = (-t) % 8
    xp = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0))) if pad_t else x
    tp = t + pad_t
    lens3 = lengths.astype(jnp.int32)[:, None, None]

    w1 = p_conv["pointwise_conv1"]["kernel"][0].astype(x.dtype)   # [D, 2D]
    b1 = p_conv["pointwise_conv1"]["bias"].astype(jnp.float32)[None]
    wd = p_conv["depthwise_conv"]["kernel"][:, 0, :].astype(jnp.float32)
    bd = p_conv["depthwise_conv"]["bias"].astype(jnp.float32)[None]
    ln_s = p_conv["norm"]["scale"].astype(jnp.float32)[None]
    ln_b = p_conv["norm"]["bias"].astype(jnp.float32)[None]
    w2 = p_conv["pointwise_conv2"]["kernel"][0].astype(x.dtype)
    b2 = p_conv["pointwise_conv2"]["bias"].astype(jnp.float32)[None]
    pre_s = p_norm["scale"].astype(jnp.float32)[None]
    pre_b = p_norm["bias"].astype(jnp.float32)[None]

    seq_spec = pl.BlockSpec((1, tp, d), lambda bi: (bi, 0, 0),
                            memory_space=pltpu.VMEM)

    def vec(arr):
        return pl.BlockSpec(arr.shape, lambda bi: tuple(0 for _ in arr.shape),
                            memory_space=pltpu.VMEM)

    out, cache = pl.pallas_call(
        functools.partial(_conv_kernel, kernel_size=kernel_size, t_orig=t),
        out_shape=(
            jax.ShapeDtypeStruct((b, tp, d), x.dtype),
            jax.ShapeDtypeStruct((b, ctx, d), x.dtype),
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            seq_spec,
            vec(pre_s), vec(pre_b), vec(w1), vec(b1), vec(wd), vec(bd),
            vec(ln_s), vec(ln_b), vec(w2), vec(b2),
        ],
        out_specs=(
            seq_spec,
            pl.BlockSpec((1, ctx, d), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(lens3, xp, pre_s, pre_b, w1, b1, wd, bd, ln_s, ln_b, w2, b2)
    return out[:, :t], cache
