"""Fused relative-position flash-attention Pallas kernels (fwd + bwd).

Forward computes softmax((q+u)K^T + bd) V in one VMEM-resident pass per
query tile with online-softmax accumulators. The relative bias bd uses the
exact sinusoid angle-addition factorization
(models/attention.rel_bias_decomposed): the caller precomputes
AB = [alpha;beta] [B,H,T,D] and key features F = [cos;sin] [Tk,D], so inside
the kernel bd is just a second MXU matmul per tile — no gather, no skew, no
[T, T+Tk-1] intermediate. Scores, softmax and the AV accumulation never
round-trip HBM (the XLA path materializes [B,H,T,Tk] scores twice).

Backward is a custom VJP in the standard flash style: the forward saves the
per-row log-sum-exp instead of the [T,Tk] probability matrix, and two
kernels recompute the score tiles to accumulate
  dV = P^T dO,            dK  = scale * dS^T (q+u),
  dQu = scale * dS K,     dAB = scale * dS F,
with dS = P * (dP - delta), dP = dO V^T, delta = rowsum(dO * O).
k_feats (sin/cos of integer positions) and the mask carry no gradient.

This makes the kernel usable in the training hot loop (reference MHSA
src/attention.py:54-100) — not just inference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._compat import resolve_interpret

_NEG_INF = -1e30
# lse sentinel for fully-masked rows: exp(s - _LSE_BIG) == 0 for any score
_LSE_BIG = 1e30


def _tile_keep_mask(seed, bi, hi, q0, k0, n_h, shape, drop_rate):
    """Counter-based dropout keep-mask from global element coordinates.

    Pure vector-unit hash (xorshift-multiply avalanche, murmur3-style
    finalizer) of (seed, batch*head, global query row, global key col).
    Deliberately NOT the stateful pltpu.prng_* API: seeding the hardware
    PRNG inside the k-tile fori_loop faults the TPU core, and a stateful
    stream would tie the mask to tile visit order anyway. A coordinate
    hash gives every (fwd, dq, dkv) kernel — which walk the (q, k) tiles
    in different grid orders — a bit-identical mask per element, and the
    same code lowers under CPU interpret mode so it is testable off-chip.
    Attention-prob dropout therefore never exists as a tensor anywhere
    (the XLA path materializes the [B,H,T,Tk] mask in HBM).
    """
    rows = q0.astype(jnp.uint32) + jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = k0.astype(jnp.uint32) + jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    bh = bi.astype(jnp.uint32) * jnp.uint32(n_h) + hi.astype(jnp.uint32)
    x = (
        seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
        + bh * jnp.uint32(0x85EBCA6B)
        ^ rows * jnp.uint32(0xC2B2AE35)
        ^ cols * jnp.uint32(0x27D4EB2F)
    )
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    thr = np.uint32(min(max(drop_rate, 0.0), 1.0) * 4294967296.0)
    return x >= thr  # keep with prob 1 - drop_rate (within 2^-32)


def _attn_fwd_kernel(
    q_ref,      # [1, 1, TQ, dk]
    ab_ref,     # [1, 1, TQ, D]
    k_ref,      # [1, 1, TK_total, dk]
    v_ref,      # [1, 1, TK_total, dk]
    f_ref,      # [TK_total, D]
    mask_ref,   # [1, TQ, TK_total] bool
    seed_ref,   # [1] int32 (SMEM)
    out_ref,    # [1, 1, TQ, dk]
    lse_ref,    # [1, 1, TQ, 1]
    *,
    scale: float,
    tk: int,
    drop_rate: float,
    n_h: int,
):
    q = q_ref[0, 0].astype(jnp.float32)          # [TQ, dk]
    ab = ab_ref[0, 0].astype(jnp.float32)        # [TQ, D]
    tq, dk = q.shape
    tk_total = k_ref.shape[2]
    n_tiles = tk_total // tk
    inv_keep = 1.0 / (1.0 - drop_rate) if drop_rate > 0.0 else 1.0
    # program_id must be read OUTSIDE the fori_loop body: interpret mode
    # only substitutes it in the top-level kernel jaxpr.
    bi, hi, q0 = pl.program_id(0), pl.program_id(1), pl.program_id(2) * tq

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
        # The softmax normalizer l comes from the UN-dropped p (dropout is
        # applied to softmax probabilities, not to scores); only the AV
        # accumulation sees the dropped/rescaled tile.
        if drop_rate > 0.0:
            keep = _tile_keep_mask(
                seed_ref[0], bi, hi, q0, i * tk, n_h, p.shape, drop_rate,
            )
            pd = jnp.where(keep, p * inv_keep, 0.0)
        else:
            pd = p
        l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * corr + jnp.dot(pd, vs, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((tq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((tq, 1), jnp.float32)
    acc0 = jnp.zeros((tq, dk), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_tiles, body, (m0, l0, acc0))
    out = acc / jnp.maximum(l, 1e-30)
    # fully-masked rows (padding queries) -> 0, matching the XLA path
    out = jnp.where(l > 0.0, out, 0.0)
    out_ref[0, 0] = out.astype(out_ref.dtype)
    lse = jnp.where(l > 0.0, m + jnp.log(jnp.maximum(l, 1e-30)), _LSE_BIG)
    lse_ref[0, 0] = lse


def _attn_bwd_dq_kernel(
    q_ref,      # [1, 1, TQ, dk]
    ab_ref,     # [1, 1, TQ, D]
    k_ref,      # [1, 1, TK_total, dk]
    v_ref,      # [1, 1, TK_total, dk]
    f_ref,      # [TK_total, D]
    mask_ref,   # [1, TQ, TK_total]
    seed_ref,   # [1] int32 (SMEM)
    do_ref,     # [1, 1, TQ, dk]
    lse_ref,    # [1, 1, TQ, 1]
    delta_ref,  # [1, 1, TQ, 1]
    dq_ref,     # [1, 1, TQ, dk]
    dab_ref,    # [1, 1, TQ, D]
    *,
    scale: float,
    tk: int,
    drop_rate: float,
    n_h: int,
):
    q = q_ref[0, 0].astype(jnp.float32)
    ab = ab_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0].astype(jnp.float32)       # [TQ, 1]
    delta = delta_ref[0, 0].astype(jnp.float32)   # [TQ, 1]
    tq, dk = q.shape
    d_feat = ab.shape[1]
    tk_total = k_ref.shape[2]
    n_tiles = tk_total // tk
    inv_keep = 1.0 / (1.0 - drop_rate) if drop_rate > 0.0 else 1.0
    bi, hi, q0 = pl.program_id(0), pl.program_id(1), pl.program_id(2) * tq

    def body(i, carry):
        dq, dab = carry
        ks = k_ref[0, 0, pl.ds(i * tk, tk), :].astype(jnp.float32)
        vs = v_ref[0, 0, pl.ds(i * tk, tk), :].astype(jnp.float32)
        fs = f_ref[pl.ds(i * tk, tk), :].astype(jnp.float32)
        mask = mask_ref[0, :, pl.ds(i * tk, tk)]

        ac = jnp.dot(q, ks.T, preferred_element_type=jnp.float32)
        bd = jnp.dot(ab, fs.T, preferred_element_type=jnp.float32)
        s = (ac + bd) * scale
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)         # [TQ, tk]
        dp = jnp.dot(do, vs.T, preferred_element_type=jnp.float32)
        # dropout on probs: dP = dPd * M/keep; delta = rowsum(dO*O) stays
        # exact because O already contains the dropped probabilities.
        if drop_rate > 0.0:
            keep = _tile_keep_mask(
                seed_ref[0], bi, hi, q0, i * tk, n_h, p.shape, drop_rate,
            )
            dp = jnp.where(keep, dp * inv_keep, 0.0)
        ds = p * (dp - delta) * scale
        dq = dq + jnp.dot(ds, ks, preferred_element_type=jnp.float32)
        dab = dab + jnp.dot(ds, fs, preferred_element_type=jnp.float32)
        return dq, dab

    dq0 = jnp.zeros((tq, dk), jnp.float32)
    dab0 = jnp.zeros((tq, d_feat), jnp.float32)
    dq, dab = jax.lax.fori_loop(0, n_tiles, body, (dq0, dab0))
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dab_ref[0, 0] = dab.astype(dab_ref.dtype)


def _attn_bwd_dkv_kernel(
    q_ref,      # [1, 1, TQ_total, dk]
    ab_ref,     # [1, 1, TQ_total, D]
    k_ref,      # [1, 1, TK, dk]
    v_ref,      # [1, 1, TK, dk]
    f_ref,      # [TK, D]
    mask_ref,   # [1, TQ_total, TK]
    seed_ref,   # [1] int32 (SMEM)
    do_ref,     # [1, 1, TQ_total, dk]
    lse_ref,    # [1, 1, TQ_total, 1]
    delta_ref,  # [1, 1, TQ_total, 1]
    dk_ref,     # [1, 1, TK, dk]
    dv_ref,     # [1, 1, TK, dk]
    *,
    scale: float,
    tq: int,
    drop_rate: float,
    n_h: int,
):
    ks = k_ref[0, 0].astype(jnp.float32)                   # [TK, dk]
    vs = v_ref[0, 0].astype(jnp.float32)
    fs = f_ref[...].astype(jnp.float32)                    # [TK, D]
    tk, dk = ks.shape
    tq_total = q_ref.shape[2]
    n_tiles = tq_total // tq
    inv_keep = 1.0 / (1.0 - drop_rate) if drop_rate > 0.0 else 1.0
    bi, hi, k0 = pl.program_id(0), pl.program_id(1), pl.program_id(2) * tk

    def body(i, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, 0, pl.ds(i * tq, tq), :].astype(jnp.float32)
        ab = ab_ref[0, 0, pl.ds(i * tq, tq), :].astype(jnp.float32)
        do = do_ref[0, 0, pl.ds(i * tq, tq), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(i * tq, tq), :].astype(jnp.float32)
        delta = delta_ref[0, 0, pl.ds(i * tq, tq), :].astype(jnp.float32)
        mask = mask_ref[0, pl.ds(i * tq, tq), :]

        ac = jnp.dot(q, ks.T, preferred_element_type=jnp.float32)
        bd = jnp.dot(ab, fs.T, preferred_element_type=jnp.float32)
        s = (ac + bd) * scale
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)         # [tq, TK]
        dp = jnp.dot(do, vs.T, preferred_element_type=jnp.float32)
        if drop_rate > 0.0:
            # q rows come from the loop var here, k cols from the grid axis
            # — global coordinates, so the hash matches fwd/dq bit-exactly.
            keep = _tile_keep_mask(
                seed_ref[0], bi, hi, i * tq, k0, n_h, p.shape, drop_rate,
            )
            pd = jnp.where(keep, p * inv_keep, 0.0)
            dp = jnp.where(keep, dp * inv_keep, 0.0)
        else:
            pd = p
        dv_acc = dv_acc + jnp.dot(pd.T, do, preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        dk_acc = dk_acc + jnp.dot(ds.T, q, preferred_element_type=jnp.float32)
        return dk_acc, dv_acc

    dk0 = jnp.zeros((tk, dk), jnp.float32)
    dv0 = jnp.zeros((tk, dk), jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(0, n_tiles, body, (dk0, dv0))
    dk_ref[0, 0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv_acc.astype(dv_ref.dtype)


def _pad_all(q_u, ab, k, v, k_feats, mask, tile_q, tile_k):
    b, h, t, dk = q_u.shape
    tk_total = k.shape[2]
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
    return q_u, ab, k, v, k_feats, mask


def _fwd_impl(
    q_u, ab, k, v, k_feats, mask, seed, scale, tile_q, tile_k, drop_rate,
    interpret,
):
    b, h, t, dk = q_u.shape
    tk_total = k.shape[2]
    q_u, ab, k, v, k_feats, mask = _pad_all(
        q_u, ab, k, v, k_feats, mask, tile_q, tile_k
    )
    tp, tkp = q_u.shape[2], k.shape[2]
    d_feat = ab.shape[-1]

    grid = (b, h, tp // tile_q)
    out, lse = pl.pallas_call(
        functools.partial(
            _attn_fwd_kernel, scale=scale, tk=tile_k, drop_rate=drop_rate,
            n_h=h,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, tp, dk), v.dtype),
            jax.ShapeDtypeStruct((b, h, tp, 1), jnp.float32),
        ],
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
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, tile_q, dk), lambda bi, hi, qi: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tile_q, 1), lambda bi, hi, qi: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        interpret=interpret,
    )(q_u, ab, k, v, k_feats, mask, seed)
    return out[:, :, :t, :], lse[:, :, :t, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _flash(
    scale, tile_q, tile_k, drop_rate, interpret, q_u, ab, k, v, k_feats,
    mask, seed,
):
    out, _ = _fwd_impl(
        q_u, ab, k, v, k_feats, mask, seed, scale, tile_q, tile_k,
        drop_rate, interpret,
    )
    return out


def _flash_fwd(
    scale, tile_q, tile_k, drop_rate, interpret, q_u, ab, k, v, k_feats,
    mask, seed,
):
    out, lse = _fwd_impl(
        q_u, ab, k, v, k_feats, mask, seed, scale, tile_q, tile_k,
        drop_rate, interpret,
    )
    return out, (q_u, ab, k, v, k_feats, mask, seed, out, lse)


def _flash_bwd(scale, tile_q, tile_k, drop_rate, interpret, res, g):
    q_u, ab, k, v, k_feats, mask, seed, out, lse = res
    b, h, t, dk = q_u.shape
    tk_total = k.shape[2]
    d_feat = ab.shape[-1]
    in_dtypes = (q_u.dtype, ab.dtype, k.dtype, v.dtype)

    # delta_i = dO_i . O_i (flash-backward row correction), fp32
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )  # [B, H, T]

    q_p, ab_p, k_p, v_p, f_p, mask_p = _pad_all(
        q_u, ab, k, v, k_feats, mask, tile_q, tile_k
    )
    pad_q = q_p.shape[2] - t
    pad_k = k_p.shape[2] - tk_total
    do_p = jnp.pad(g, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    # padded query rows: lse sentinel keeps p == 0
    lse_p = jnp.pad(lse, ((0, 0), (0, 0), (0, pad_q)),
                    constant_values=_LSE_BIG)[..., None]
    delta_p = jnp.pad(delta, ((0, 0), (0, 0), (0, pad_q)))[..., None]
    tp, tkp = q_p.shape[2], k_p.shape[2]

    common_specs = dict(memory_space=pltpu.VMEM)
    dq, dab = pl.pallas_call(
        functools.partial(
            _attn_bwd_dq_kernel, scale=scale, tk=tile_k,
            drop_rate=drop_rate, n_h=h,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, tp, dk), jnp.float32),
            jax.ShapeDtypeStruct((b, h, tp, d_feat), jnp.float32),
        ],
        grid=(b, h, tp // tile_q),
        in_specs=[
            pl.BlockSpec((1, 1, tile_q, dk),
                         lambda bi, hi, qi: (bi, hi, qi, 0), **common_specs),
            pl.BlockSpec((1, 1, tile_q, d_feat),
                         lambda bi, hi, qi: (bi, hi, qi, 0), **common_specs),
            pl.BlockSpec((1, 1, tkp, dk),
                         lambda bi, hi, qi: (bi, hi, 0, 0), **common_specs),
            pl.BlockSpec((1, 1, tkp, dk),
                         lambda bi, hi, qi: (bi, hi, 0, 0), **common_specs),
            pl.BlockSpec((tkp, d_feat),
                         lambda bi, hi, qi: (0, 0), **common_specs),
            pl.BlockSpec((1, tile_q, tkp),
                         lambda bi, hi, qi: (bi, qi, 0), **common_specs),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, tile_q, dk),
                         lambda bi, hi, qi: (bi, hi, qi, 0), **common_specs),
            pl.BlockSpec((1, 1, tile_q, 1),
                         lambda bi, hi, qi: (bi, hi, qi, 0), **common_specs),
            pl.BlockSpec((1, 1, tile_q, 1),
                         lambda bi, hi, qi: (bi, hi, qi, 0), **common_specs),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile_q, dk),
                         lambda bi, hi, qi: (bi, hi, qi, 0), **common_specs),
            pl.BlockSpec((1, 1, tile_q, d_feat),
                         lambda bi, hi, qi: (bi, hi, qi, 0), **common_specs),
        ],
        interpret=interpret,
    )(q_p, ab_p, k_p, v_p, f_p, mask_p, seed, do_p, lse_p, delta_p)

    dk_arr, dv_arr = pl.pallas_call(
        functools.partial(
            _attn_bwd_dkv_kernel, scale=scale, tq=tile_q,
            drop_rate=drop_rate, n_h=h,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, tkp, dk), jnp.float32),
            jax.ShapeDtypeStruct((b, h, tkp, dk), jnp.float32),
        ],
        grid=(b, h, tkp // tile_k),
        in_specs=[
            pl.BlockSpec((1, 1, tp, dk),
                         lambda bi, hi, ki: (bi, hi, 0, 0), **common_specs),
            pl.BlockSpec((1, 1, tp, d_feat),
                         lambda bi, hi, ki: (bi, hi, 0, 0), **common_specs),
            pl.BlockSpec((1, 1, tile_k, dk),
                         lambda bi, hi, ki: (bi, hi, ki, 0), **common_specs),
            pl.BlockSpec((1, 1, tile_k, dk),
                         lambda bi, hi, ki: (bi, hi, ki, 0), **common_specs),
            pl.BlockSpec((tile_k, d_feat),
                         lambda bi, hi, ki: (ki, 0), **common_specs),
            pl.BlockSpec((1, tp, tile_k),
                         lambda bi, hi, ki: (bi, 0, ki), **common_specs),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, tp, dk),
                         lambda bi, hi, ki: (bi, hi, 0, 0), **common_specs),
            pl.BlockSpec((1, 1, tp, 1),
                         lambda bi, hi, ki: (bi, hi, 0, 0), **common_specs),
            pl.BlockSpec((1, 1, tp, 1),
                         lambda bi, hi, ki: (bi, hi, 0, 0), **common_specs),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile_k, dk),
                         lambda bi, hi, ki: (bi, hi, ki, 0), **common_specs),
            pl.BlockSpec((1, 1, tile_k, dk),
                         lambda bi, hi, ki: (bi, hi, ki, 0), **common_specs),
        ],
        interpret=interpret,
    )(q_p, ab_p, k_p, v_p, f_p, mask_p, seed, do_p, lse_p, delta_p)

    d_q = dq[:, :, :t, :].astype(in_dtypes[0])
    d_ab = dab[:, :, :t, :].astype(in_dtypes[1])
    d_k = dk_arr[:, :, :tk_total, :].astype(in_dtypes[2])
    d_v = dv_arr[:, :, :tk_total, :].astype(in_dtypes[3])
    d_feats = jnp.zeros_like(k_feats)  # sin/cos of positions: no params
    d_mask = np.zeros(mask.shape, jax.dtypes.float0)
    d_seed = np.zeros(seed.shape, jax.dtypes.float0)
    return d_q, d_ab, d_k, d_v, d_feats, d_mask, d_seed


_flash.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "tile_q", "tile_k", "dropout_rate", "interpret"),
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
    dropout_rate: float = 0.0,
    dropout_seed: jax.Array | None = None,  # [1] int32; required if rate > 0
    tile_q: int | None = None,
    tile_k: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Returns attn output [B, H, T, dk] (same dtype as v). Differentiable
    (custom flash-style VJP) — safe inside the training loss.

    dropout_rate > 0 applies attention-prob dropout INSIDE the kernel
    (reference src/attention.py:97: dropout on the softmax probs): the keep
    mask is a stateless per-element hash of
    (seed, batch, head, global row, global col) — see _tile_keep_mask — so
    forward and backward regenerate identical masks and the probability
    matrix still never exists in HBM. Works under CPU interpret mode too."""
    interpret = resolve_interpret(interpret)
    t = q_u.shape[2]
    tk_total = k.shape[2]
    if tile_q is None:
        # ASR sequences are short: one whole-sequence tile beats flash
        # tiling (20% faster at Conformer-M T'=376, no padding waste, no
        # online-softmax corrections). Fall back to 768-tiles when the
        # [tile_q, tile_k] score block would stress VMEM.
        tile_q = min(-(-t // 128) * 128, 768)
    if tile_k is None:
        tile_k = min(-(-tk_total // 128) * 128, 768)
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    seed = (
        jnp.zeros((1,), jnp.int32)
        if dropout_seed is None
        else dropout_seed.reshape(1).astype(jnp.int32)
    )
    return _flash(
        scale, tile_q, tile_k, float(dropout_rate), interpret,
        q_u, ab, k, v, k_feats, mask, seed,
    )
