"""Fused relative-position flash-attention Pallas kernel (forward).

Computes softmax((q+u)K^T + bd) V in one VMEM-resident pass per query tile
with online-softmax accumulators. The relative bias bd uses the exact
sinusoid angle-addition factorization (models/attention.rel_bias_decomposed):
the caller precomputes AB = [alpha;beta] [B,H,T,D] and key features
F = [cos;sin] [Tk,D], so inside the kernel bd is just a second MXU matmul
per tile — no gather, no skew, no [T, T+Tk-1] intermediate.

Scores, softmax and the AV accumulation never round-trip HBM (the XLA path
materializes [B,H,T,Tk] scores twice). Masking comes in as [B, T, Tk] bool
tiles, so padding and chunk masks both work.

Forward/inference only — training keeps the autodiff-able XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _attn_kernel(
    q_ref,      # [1, 1, TQ, dk]
    ab_ref,     # [1, 1, TQ, D]
    k_ref,      # [1, 1, TK_total, dk]
    v_ref,      # [1, 1, TK_total, dk]
    f_ref,      # [TK_total, D]
    mask_ref,   # [1, TQ, TK_total] bool
    out_ref,    # [1, 1, TQ, dk]
    *,
    scale: float,
    tk: int,
):
    q = q_ref[0, 0].astype(jnp.float32)          # [TQ, dk]
    ab = ab_ref[0, 0].astype(jnp.float32)        # [TQ, D]
    tq, dk = q.shape
    tk_total = k_ref.shape[2]
    n_tiles = tk_total // tk

    def body(i, carry):
        m, l, acc = carry
        ks = k_ref[0, 0, pl.ds(i * tk, tk), :].astype(jnp.float32)
        vs = v_ref[0, 0, pl.ds(i * tk, tk), :].astype(jnp.float32)
        fs = f_ref[pl.ds(i * tk, tk), :].astype(jnp.float32)
        mask = mask_ref[0, :, pl.ds(i * tk, tk)]

        ac = jnp.dot(q, ks.T, preferred_element_type=jnp.float32)
        bd = jnp.dot(ab, fs.T, preferred_element_type=jnp.float32)
        s = (ac + bd) * scale
        s = jnp.where(mask, s, _NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        # guard fully-masked rows: with every score at _NEG_INF,
        # exp(s - m_new) would be exp(0) = 1
        corr = jnp.where(m > 0.5 * _NEG_INF, jnp.exp(m - m_new), 0.0)
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * corr + jnp.dot(p, vs, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((tq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((tq, 1), jnp.float32)
    acc0 = jnp.zeros((tq, dk), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_tiles, body, (m0, l0, acc0))
    out = acc / jnp.maximum(l, 1e-30)
    # fully-masked rows (padding queries) -> 0, matching the XLA path
    out = jnp.where(l > 0.0, out, 0.0)
    out_ref[0, 0] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "tile_q", "tile_k", "interpret")
)
def rel_flash_attention(
    q_u: jax.Array,     # [B, H, T, dk] content query (+u bias)
    ab: jax.Array,      # [B, H, T, D] position query features
    k: jax.Array,       # [B, H, Tk, dk]
    v: jax.Array,       # [B, H, Tk, dk]
    k_feats: jax.Array, # [Tk, D]
    mask: jax.Array,    # [B, T, Tk] bool (True = attend)
    *,
    scale: float,
    tile_q: int | None = None,
    tile_k: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Returns attn output [B, H, T, dk] (same dtype as v)."""
    b, h, t, dk = q_u.shape
    tk_total = k.shape[2]
    if tile_q is None:
        # ASR sequences are short: one whole-sequence tile beats flash
        # tiling (20% faster at Conformer-M T'=376, no padding waste, no
        # online-softmax corrections). Fall back to 768-tiles when the
        # [tile_q, tile_k] score block would stress VMEM.
        tile_q = min(-(-t // 128) * 128, 768)
    if tile_k is None:
        tile_k = min(-(-tk_total // 128) * 128, 768)

    pad_q = (-t) % tile_q
    pad_k = (-tk_total) % tile_k
    if pad_q:
        q_u = jnp.pad(q_u, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        ab = jnp.pad(ab, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        k_feats = jnp.pad(k_feats, ((0, pad_k), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, pad_k)))
    tp, tkp = t + pad_q, tk_total + pad_k
    d_feat = ab.shape[-1]

    grid = (b, h, tp // tile_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, tk=tile_k),
        out_shape=jax.ShapeDtypeStruct((b, h, tp, dk), v.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, tile_q, dk), lambda bi, hi, qi: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tile_q, d_feat), lambda bi, hi, qi: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tkp, dk), lambda bi, hi, qi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tkp, dk), lambda bi, hi, qi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tkp, d_feat), lambda bi, hi, qi: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_q, tkp), lambda bi, hi, qi: (bi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tile_q, dk), lambda bi, hi, qi: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(q_u, ab, k, v, k_feats, mask)
    return out[:, :, :t, :]
