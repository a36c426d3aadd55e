"""Pallas RNN-T lattice DP kernel (forward + analytic-gradient backward).

TPU-native replacement for the (T, U) forward-backward inside
torchaudio.functional.rnnt_loss (reference src/model.py:107-112). Takes the
pre-gathered lattice log-probs (lp_blank, lp_emit) [B, T, U+1] — produced
without materializing [B, T, U, V] by ops/rnnt.rnnt_lattice_log_probs_fused —
and runs the alpha/beta DP entirely on-chip.

Design (SURVEY.md §7 hard-part #1: anti-diagonal wavefront):
  - The lattice is pre-skewed in XLA to diagonal-major layout
    sk[d, b, u] = x[b, d - u, u], so each DP step
        alpha[d+1] = logaddexp(alpha[d] + blank[d], shift_r(alpha[d] + emit[d]))
    is pure VPU elementwise work plus one lane shift — no gathers, no
    per-cell control flow, and every diagonal of every batch row advances
    in lock-step.
  - The kernel streams [D_TILE, 8, U1] diagonal slabs through VMEM on a
    (B/8, D/D_TILE) grid (TPU grids run sequentially, so the [8, U1]
    alpha/beta wavefront carries across grid steps in scratch); peak VMEM
    is O(D_TILE · U1), independent of T.
  - Forward saves the alpha diagonals; backward replays them against the
    beta wavefront and emits the exact occupancy gradients
        d nll / d lp_blank[t, u] = -exp(alpha[t,u] + lp_blank[t,u]
                                         + beta[t+1,u] - logZ)
    in one reverse pass (custom VJP — no autodiff through the scan, no
    rematerialization of the DP).

The pure-JAX path in ops/rnnt.py remains the reference implementation and
the CPU/interpret test oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._compat import resolve_interpret

_NEG_INF = -1e30


def _pick_b_tile(b: int) -> int:
    """Wider batch tiles amortize the VPU dependency-chain latency of the
    sequential diagonal loop; 8 (one f32 sublane tile) for small batches."""
    return 32 if b > 16 else 8


def _shift_right(x: jax.Array) -> jax.Array:
    """Lane shift: out[:, u] = x[:, u-1]; lane 0 <- -inf."""
    fill = jnp.full((x.shape[0], 1), _NEG_INF, x.dtype)
    return jnp.concatenate([fill, x[:, :-1]], axis=1)


def _shift_left(x: jax.Array) -> jax.Array:
    """Lane shift: out[:, u] = x[:, u+1]; last lane <- -inf."""
    fill = jnp.full((x.shape[0], 1), _NEG_INF, x.dtype)
    return jnp.concatenate([x[:, 1:], fill], axis=1)


def _fwd_kernel(
    tlen_ref,   # [BT, 1] int32
    ulen_ref,   # [BT, 1] int32
    blank_ref,  # [DT, BT, U1] f32 (skewed)
    emit_ref,   # [DT, BT, U1] f32 (skewed)
    nll_ref,    # [BT, 1] f32 out
    alpha_ref,  # [DT, BT, U1] f32 out (skewed alpha)
    alpha_c,    # [BT, U1] f32 scratch — wavefront carry
    fin_c,      # [BT, U1] f32 scratch — terminal accumulator (elementwise;
                # each row has exactly one terminal (d, lane) cell, so a
                # single cross-lane reduce at the end suffices)
):
    j = pl.program_id(1)
    dt, bb, u1 = blank_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (bb, u1), 1)
    ulen = ulen_ref[:]                       # [BT, 1]
    dterm = tlen_ref[:] + ulen - 1           # [BT, 1] terminal diagonal

    @pl.when(j == 0)
    def _():
        alpha_c[:] = jnp.where(lane == 0, 0.0, _NEG_INF)
        fin_c[:] = jnp.full((bb, u1), _NEG_INF, jnp.float32)

    def body(i, carry):
        alpha, fin = carry
        d = j * dt + i
        b_row = blank_ref[i]
        e_row = emit_ref[i]
        alpha_ref[i] = alpha
        cand = alpha + b_row
        term = (d == dterm) & (lane == ulen)
        fin = jnp.where(term, cand, fin)
        alpha = jnp.maximum(
            jnp.logaddexp(cand, _shift_right(alpha + e_row)), _NEG_INF
        )
        return alpha, fin

    alpha, fin = jax.lax.fori_loop(0, dt, body, (alpha_c[:], fin_c[:]))
    alpha_c[:] = alpha
    fin_c[:] = fin

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        nll_ref[:] = -jnp.max(fin, axis=1, keepdims=True)


def _bwd_kernel(
    tlen_ref,   # [8, 1] int32
    ulen_ref,   # [8, 1] int32
    logz_ref,   # [8, 1] f32 (log-likelihood = -nll)
    g_ref,      # [8, 1] f32 upstream cotangent
    blank_ref,  # [DT, 8, U1] f32 (skewed, reversed slab order)
    emit_ref,   # [DT, 8, U1]
    alpha_ref,  # [DT, 8, U1] saved forward alphas
    gblank_ref,  # [DT, 8, U1] out
    gemit_ref,   # [DT, 8, U1] out
    beta_c,     # [8, U1] scratch — beta wavefront
):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    dt, bb, u1 = blank_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (bb, u1), 1)
    ulen = ulen_ref[:]
    dterm = tlen_ref[:] + ulen - 1
    logz = logz_ref[:]
    g = g_ref[:]
    slab = n_j - 1 - j                       # this grid step's slab index

    @pl.when(j == 0)
    def _():
        beta_c[:] = jnp.full((bb, u1), _NEG_INF, jnp.float32)

    def body(k, beta):
        i = dt - 1 - k
        d = slab * dt + i
        b_row = blank_ref[i]
        e_row = emit_ref[i]
        a_row = alpha_ref[i]
        # beta*[t+1, u]: 0 at the terminal cell (the final blank exits the
        # lattice), else the carried diagonal-(d+1) wavefront.
        b1 = jnp.where((d == dterm) & (lane == ulen), 0.0, beta)
        # beta*[t, u+1]
        b2 = _shift_left(beta)
        gblank_ref[i] = -jnp.exp(a_row + b_row + b1 - logz) * g
        gemit_ref[i] = -jnp.exp(a_row + e_row + b2 - logz) * g
        return jnp.maximum(
            jnp.logaddexp(b_row + b1, e_row + b2), _NEG_INF
        )

    beta_c[:] = jax.lax.fori_loop(0, dt, body, beta_c[:])


def _skew(x: jax.Array, d_total: int) -> jax.Array:
    """[B, T, U1] -> diagonal-major [D, B, U1]: out[d,b,u] = x[b,d-u,u]
    (-inf outside the lattice).

    Column u is rotated down by u via a log2(U1)-step barrel shifter
    (roll + per-lane select) — XLA gathers over the time axis are ~50x
    slower than these shifts on TPU. The -inf pad region below the T rows
    is at least U1-1 deep (d_total >= T + U1 - 1), so every wrapped-around
    row lands as -inf, which is exactly the out-of-lattice value."""
    b, t, u1 = x.shape
    xp = jnp.pad(x, ((0, 0), (0, d_total - t), (0, 0)),
                 constant_values=_NEG_INF)
    u = jnp.arange(u1)
    k = 0
    while (1 << k) < u1:
        bit = ((u >> k) & 1) == 1
        xp = jnp.where(bit[None, None, :],
                       jnp.roll(xp, 1 << k, axis=1), xp)
        k += 1
    return xp.transpose(1, 0, 2)


def _unskew(sk: jax.Array, t: int) -> jax.Array:
    """[D, B, U1] -> [B, T, U1]: out[b,t,u] = sk[t+u, b, u] (inverse barrel
    shift: column u rotated up by u, then the first T rows)."""
    d_total, b, u1 = sk.shape
    xp = sk.transpose(1, 0, 2)                                      # [B, D, U1]
    u = jnp.arange(u1)
    k = 0
    while (1 << k) < u1:
        bit = ((u >> k) & 1) == 1
        xp = jnp.where(bit[None, None, :],
                       jnp.roll(xp, -(1 << k), axis=1), xp)
        k += 1
    return xp[:, :t]


def _pad_args(lp_blank, lp_emit, t_lengths, u_lengths, d_tile, b_tile):
    """Pad B to a multiple of b_tile, U1 to a multiple of 128; skew to
    diagonal-major with D padded to a multiple of d_tile."""
    b, t, u1 = lp_blank.shape
    pad_b = (-b) % b_tile
    pad_u = (-u1) % 128
    if pad_u:
        lp_blank = jnp.pad(lp_blank, ((0, 0), (0, 0), (0, pad_u)),
                           constant_values=_NEG_INF)
        lp_emit = jnp.pad(lp_emit, ((0, 0), (0, 0), (0, pad_u)),
                          constant_values=_NEG_INF)
    if pad_b:
        # dummy rows: lp_blank = 0, t_len = 1, u_len = 0 => nll = 0, grads 0
        lp_blank = jnp.pad(lp_blank, ((0, pad_b), (0, 0), (0, 0)))
        lp_emit = jnp.pad(lp_emit, ((0, pad_b), (0, 0), (0, 0)),
                          constant_values=_NEG_INF)
        t_lengths = jnp.pad(t_lengths, (0, pad_b), constant_values=1)
        u_lengths = jnp.pad(u_lengths, (0, pad_b))
    u1p = u1 + pad_u
    d_total = t + u1p - 1
    d_total += (-d_total) % d_tile
    blank_sk = _skew(lp_blank.astype(jnp.float32), d_total)
    emit_sk = _skew(lp_emit.astype(jnp.float32), d_total)
    tlen2 = t_lengths.astype(jnp.int32)[:, None]
    ulen2 = u_lengths.astype(jnp.int32)[:, None]
    return blank_sk, emit_sk, tlen2, ulen2, b + pad_b, u1p, d_total


def _slab_spec(d_tile, b_tile, u1p):
    return pl.BlockSpec(
        (d_tile, b_tile, u1p), lambda i, j: (j, i, 0),
        memory_space=pltpu.VMEM,
    )


def _slab_spec_rev(d_tile, b_tile, u1p, n_slabs):
    return pl.BlockSpec(
        (d_tile, b_tile, u1p),
        lambda i, j: (n_slabs - 1 - j, i, 0),
        memory_space=pltpu.VMEM,
    )


def _scalar_spec(b_tile):
    return pl.BlockSpec((b_tile, 1), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM)


def _forward(lp_blank, lp_emit, t_lengths, u_lengths, d_tile, interpret):
    bt = _pick_b_tile(lp_blank.shape[0])
    blank_sk, emit_sk, tlen2, ulen2, bp, u1p, d_total = _pad_args(
        lp_blank, lp_emit, t_lengths, u_lengths, d_tile, bt
    )
    grid = (bp // bt, d_total // d_tile)
    nll, alpha_sk = pl.pallas_call(
        _fwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((d_total, bp, u1p), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            _scalar_spec(bt), _scalar_spec(bt),
            _slab_spec(d_tile, bt, u1p), _slab_spec(d_tile, bt, u1p),
        ],
        out_specs=(_scalar_spec(bt), _slab_spec(d_tile, bt, u1p)),
        scratch_shapes=[
            pltpu.VMEM((bt, u1p), jnp.float32),
            pltpu.VMEM((bt, u1p), jnp.float32),
        ],
        interpret=interpret,
    )(tlen2, ulen2, blank_sk, emit_sk)
    return nll[: lp_blank.shape[0], 0], (blank_sk, emit_sk, alpha_sk,
                                         tlen2, ulen2, nll)


def _backward(res, ct, b, t, u1, d_tile, interpret):
    blank_sk, emit_sk, alpha_sk, tlen2, ulen2, nll = res
    d_total, bp, u1p = blank_sk.shape
    bt = _pick_b_tile(b)
    g = jnp.zeros((bp, 1), jnp.float32).at[:b, 0].set(
        ct.astype(jnp.float32)
    )
    n_slabs = d_total // d_tile
    grid = (bp // bt, n_slabs)
    rev = _slab_spec_rev(d_tile, bt, u1p, n_slabs)
    gblank_sk, gemit_sk = pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((d_total, bp, u1p), jnp.float32),
            jax.ShapeDtypeStruct((d_total, bp, u1p), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            _scalar_spec(bt), _scalar_spec(bt), _scalar_spec(bt),
            _scalar_spec(bt),
            rev, rev, rev,
        ],
        out_specs=(rev, rev),
        scratch_shapes=[pltpu.VMEM((bt, u1p), jnp.float32)],
        interpret=interpret,
    )(tlen2, ulen2, -nll, g, blank_sk, emit_sk, alpha_sk)
    g_blank = _unskew(gblank_sk, t)[:b, :, :u1]
    g_emit = _unskew(gemit_sk, t)[:b, :, :u1]
    return g_blank, g_emit


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _rnnt_nll_pallas(lp_blank, lp_emit, t_lengths, u_lengths,
                     d_tile, interpret):
    nll, _ = _forward(lp_blank, lp_emit, t_lengths, u_lengths,
                      d_tile, interpret)
    return nll


def _rnnt_nll_fwd(lp_blank, lp_emit, t_lengths, u_lengths, d_tile, interpret):
    nll, res = _forward(lp_blank, lp_emit, t_lengths, u_lengths,
                        d_tile, interpret)
    b, t, u1 = lp_blank.shape
    return nll, (res, (b, t, u1))


def _rnnt_nll_bwd(d_tile, interpret, saved, ct):
    res, (b, t, u1) = saved
    g_blank, g_emit = _backward(res, ct, b, t, u1, d_tile, interpret)
    return g_blank, g_emit, None, None


_rnnt_nll_pallas.defvjp(_rnnt_nll_fwd, _rnnt_nll_bwd)


def rnnt_loss_from_log_probs_pallas(
    lp_blank: jax.Array,
    lp_emit: jax.Array,
    t_lengths: jax.Array,
    u_lengths: jax.Array,
    *,
    d_tile: int = 64,
    interpret: bool | None = None,
) -> jax.Array:
    """Transducer NLL [B] from lattice log-probs — Pallas wavefront DP with
    an analytic alpha/beta custom VJP. Drop-in for
    ops.rnnt.rnnt_loss_from_log_probs (the XLA scan reference)."""
    interpret = resolve_interpret(interpret)
    return _rnnt_nll_pallas(
        lp_blank.astype(jnp.float32), lp_emit.astype(jnp.float32),
        t_lengths, u_lengths, d_tile, interpret,
    )
