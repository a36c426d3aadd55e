"""Fully-fused int8 FFN block: LN -> quant -> W1 -> swish -> quant -> W2
-> bias -> scaled residual, one VMEM pass per row tile.

The standalone int8 matmul kernel (quant_kernel.py) wins 1.36x on isolated
expansion matmuls but loses end-to-end at Conformer-M because the kernel
boundary breaks XLA's ln->matmul->swish fusion and the [TM, H] hidden
round-trips HBM between the two matmuls (docs/ROADMAP.md). This kernel
keeps the ENTIRE macaron FFN in VMEM: the [TM, H=2048] hidden exists only
in registers/VMEM, both int8 weights (0.5 MB each at Conformer-M) stay
resident, activations are read and written exactly once at [TM, D=256].

Per row tile:  HBM traffic = 2 * TM * D * 4 B;  compute = 2 * TM * D * H
int8 MACs on the MXU's double-rate int8 path. At D=256, H=2048, TM=256
that is arithmetic intensity ~1000 FLOP/B vs ~8 for the unfused chain.

Serving-only (deterministic; FFN dropout is identity at inference).
Replaces the reference's fp32 FeedForward (src/feedforward.py:4-22) inside
the macaron halves of the encoder layer (src/encoder_layer.py:49-56).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._compat import resolve_interpret


def _quant_rows(x):
    """Per-row symmetric int8: returns (int8 values, f32 [rows,1] scale)."""
    scale = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _kernel(
    x_ref, g_ref, b_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
    out_ref, *, half: float, eps: float,
):
    x = x_ref[:].astype(jnp.float32)                      # [TM, D]

    # LayerNorm (stats in f32, models/layers.py:107-114)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * g_ref[:] + b_ref[:]

    # quant -> W1 (int8 MXU) -> dequant -> bias -> swish
    xq, xs = _quant_rows(xn)
    h = jax.lax.dot_general(
        xq, w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)                                 # [TM, H]
    h = h * xs * s1_ref[:] + b1_ref[:]
    h = h * jax.nn.sigmoid(h)                             # swish

    # quant -> W2 (int8 MXU) -> dequant -> bias
    hq, hs = _quant_rows(h)
    y = jax.lax.dot_general(
        hq, w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)                                 # [TM, D]
    y = y * hs * s2_ref[:] + b2_ref[:]

    out_ref[:] = (x + half * y).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("half", "eps", "tile_m", "interpret")
)
def int8_ffn_fused(
    x: jax.Array,          # [..., D] float
    ln: dict,              # {"scale" [D], "bias" [D]}
    w1q: jax.Array,        # [D, H] int8
    s1: jax.Array,         # [H] f32 per-channel weight scales
    b1: jax.Array,         # [H]
    w2q: jax.Array,        # [H, D] int8
    s2: jax.Array,         # [D] f32
    b2: jax.Array,         # [D]
    *,
    half: float = 0.5,
    eps: float = 1e-5,
    tile_m: int = 256,
    interpret: bool | None = None,
) -> jax.Array:
    """x + half * FFN_int8(LN(x)), fused; same shape/dtype as x."""
    interpret = resolve_interpret(interpret)
    d = x.shape[-1]
    h = w1q.shape[1]
    x2 = x.reshape(-1, d)
    m = x2.shape[0]
    tile_m = min(tile_m, max(32, m))  # int8 min sublane tile is 32
    pad_m = (-m) % tile_m
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
    mp = m + pad_m

    row = lambda a: a.reshape(1, -1).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_kernel, half=half, eps=eps),
        out_shape=jax.ShapeDtypeStruct((mp, d), x.dtype),
        grid=(mp // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *[pl.BlockSpec((1, d), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)] * 2,   # ln scale/bias
            pl.BlockSpec((d, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            *[pl.BlockSpec((1, h), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)] * 2,   # s1, b1
            pl.BlockSpec((h, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            *[pl.BlockSpec((1, d), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)] * 2,   # s2, b2
        ],
        out_specs=pl.BlockSpec((tile_m, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        x2, row(ln["scale"]), row(ln["bias"]),
        w1q, row(s1), row(b1), w2q, row(s2), row(b2),
    )
    return out[:m].reshape(x.shape)


def int8_ffn_reference(x, ln, w1q, s1, b1, w2q, s2, b2, *, half=0.5, eps=1e-5):
    """XLA oracle with identical quantization math (for tests/CPU)."""
    from ...models import layers

    xn = layers.layer_norm(ln, x.astype(jnp.float32), eps=eps)
    xq, xs = _quant_rows(xn.astype(jnp.float32))
    h = jax.lax.dot_general(
        xq, w1q, dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * xs * s1 + b1
    h = h * jax.nn.sigmoid(h)
    hq, hs = _quant_rows(h)
    y = jax.lax.dot_general(
        hq, w2q, dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * hs * s2 + b2
    return (x.astype(jnp.float32) + half * y).astype(x.dtype)
