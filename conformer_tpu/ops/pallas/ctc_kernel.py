"""Pallas CTC DP kernel (forward + analytic-gradient backward).

The XLA `lax.scan` CTC (ops/ctc.py, the reference-parity oracle — torch
CTCLoss semantics, reference src/decoder.py:15,21) is latency-bound on TPU:
374 sequential scan steps of [B, 2U+1] VPU work cost ~52 ms fwd+bwd at
Conformer-M shapes — 15% of the whole train step for ~0 model FLOPs
(measured r3, docs/PERF.md). This kernel runs the same alpha recursion as a
`fori_loop` INSIDE one Pallas program so the whole DP is a single fused
on-chip loop over VMEM-resident state:

  - inputs are the pre-gathered extended-label emissions emit[B, T, S]
    (S = 2U+1 interleaved blanks). The [B,T,V] -> [B,T,S] selection runs
    in XLA as a one-hot MXU matmul with precision=HIGHEST — bit-exact
    selection (one 1.0 per row, zeros elsewhere) that reads [B,T,V] once
    at HBM bandwidth; a lane-dim take_along_axis gather costs ~23 ms at
    Conformer-M shapes vs ~1.9 ms for the matmul, and autodiff turns the
    matmul's cotangent scatter into another matmul instead of an 18 ms
    XLA scatter;
  - time-major [T_TILE, BT, S] slabs stream through VMEM on a
    (B/BT, T/T_TILE) grid; TPU grids run sequentially, so the [BT, S]
    alpha wavefront carries across grid steps in scratch;
  - the s-1 / s-2 state shifts are lane shifts (concatenate), no gathers;
  - forward saves the alpha rows; backward replays them against the beta
    wavefront in one reverse pass and emits the exact occupancy gradient
        d nll / d emit[t, s] = -exp(alpha[t,s] + betahat[t,s] - logZ)
    (custom VJP — no autodiff through the scan).

Per-row valid lengths follow ops/ctc.py's freeze semantics: alpha stops
updating at t >= input_len, so the final slab's alpha equals alpha at
t = len-1 for every row; beta symmetrically holds its terminal init until
t < len-1, and grads are masked to t < len.
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
    return 32 if b > 16 else 8


def _shift_down1(x: jax.Array) -> jax.Array:
    """out[:, s] = x[:, s-1]; lane 0 <- -inf."""
    fill = jnp.full((x.shape[0], 1), _NEG_INF, x.dtype)
    return jnp.concatenate([fill, x[:, :-1]], axis=1)


def _shift_down2(x: jax.Array) -> jax.Array:
    fill = jnp.full((x.shape[0], 2), _NEG_INF, x.dtype)
    return jnp.concatenate([fill, x[:, :-2]], axis=1)


def _shift_up1(x: jax.Array) -> jax.Array:
    """out[:, s] = x[:, s+1]; last lane <- -inf."""
    fill = jnp.full((x.shape[0], 1), _NEG_INF, x.dtype)
    return jnp.concatenate([x[:, 1:], fill], axis=1)


def _shift_up2(x: jax.Array) -> jax.Array:
    fill = jnp.full((x.shape[0], 2), _NEG_INF, x.dtype)
    return jnp.concatenate([x[:, 2:], fill], axis=1)


def _fwd_kernel(
    tlen_ref,    # [BT, 1] int32
    ulen_ref,    # [BT, 1] int32
    skip_ref,    # [BT, S] f32: 0 where the s-2 skip is allowed, else -inf
    emit_ref,    # [TT, BT, S] f32 (time-major slab)
    nll_ref,     # [BT, 1] f32 out
    alpha_ref,   # [TT, BT, S] f32 out — saved alpha rows (post-update)
    alpha_c,     # [BT, S] f32 scratch — wavefront carry
):
    j = pl.program_id(1)
    tt, bb, s = emit_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (bb, s), 1)
    tlen = tlen_ref[:]                        # [BT, 1]
    ulen = ulen_ref[:]
    skip = skip_ref[:]

    @pl.when(j == 0)
    def _():
        alpha_c[:] = jnp.full((bb, s), _NEG_INF, jnp.float32)

    def body(i, alpha):
        t = j * tt + i
        e_row = emit_ref[i]
        # t == 0: init alpha0 = emit[0] on lanes {0, 1} (lane 1 only if U>0)
        init = jnp.where(
            (lane < 2) & ~((lane == 1) & (ulen == 0)), e_row, _NEG_INF
        )
        summed = jnp.logaddexp(
            jnp.logaddexp(alpha, _shift_down1(alpha)),
            _shift_down2(alpha) + skip,
        )
        upd = jnp.maximum(summed + e_row, _NEG_INF)
        new_alpha = jnp.where(t == 0, init, jnp.where(t < tlen, upd, alpha))
        alpha_ref[i] = new_alpha
        return new_alpha

    alpha_c[:] = jax.lax.fori_loop(0, tt, body, alpha_c[:])

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        alpha = alpha_c[:]
        s_last = 2 * ulen                     # [BT, 1]
        fb = jnp.max(jnp.where(lane == s_last, alpha, _NEG_INF),
                     axis=1, keepdims=True)
        fl = jnp.max(
            jnp.where((lane == s_last - 1) & (ulen > 0), alpha, _NEG_INF),
            axis=1, keepdims=True,
        )
        nll_ref[:] = -jnp.logaddexp(fb, fl)


def _bwd_kernel(
    tlen_ref,    # [BT, 1] int32
    ulen_ref,    # [BT, 1] int32
    logz_ref,    # [BT, 1] f32 (= -nll)
    g_ref,       # [BT, 1] f32 upstream cotangent
    skip_ref,    # [BT, S] f32
    emit_ref,    # [TT, BT, S] (reversed slab order)
    alpha_ref,   # [TT, BT, S] saved alphas (reversed slab order)
    gemit_ref,   # [TT, BT, S] out
    beta_c,      # [BT, S] f32 scratch — betahat wavefront (betahat[t+1])
):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    tt, bb, s = emit_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (bb, s), 1)
    tlen = tlen_ref[:]
    ulen = ulen_ref[:]
    skip = skip_ref[:]
    logz = logz_ref[:]
    g = g_ref[:]
    slab = n_j - 1 - j
    s_last = 2 * ulen
    term = jnp.where(
        (lane == s_last) | ((lane == s_last - 1) & (ulen > 0)),
        0.0, _NEG_INF,
    )

    @pl.when(j == 0)
    def _():
        beta_c[:] = jnp.full((bb, s), _NEG_INF, jnp.float32)

    def body(k, beta):
        i = tt - 1 - k
        t = slab * tt + i
        # betahat[t] from betahat[t+1]: v = emit[t+1] + betahat[t+1] was
        # folded into `beta` by the previous iteration; rows with
        # t >= tlen-1 hold the terminal init instead.
        betahat = jnp.where(t >= tlen - 1, term, beta)
        a_row = alpha_ref[i]
        e_row = emit_ref[i]
        gemit_ref[i] = jnp.where(
            t < tlen, -jnp.exp(a_row + betahat - logz) * g, 0.0
        )
        # fold emission at t, then combine transitions into betahat[t-1]:
        # betahat[t-1, s] = LSE(v[s], v[s+1], skip[s+2] ? v[s+2])
        v = e_row + betahat
        nxt = jnp.logaddexp(
            jnp.logaddexp(v, _shift_up1(v)),
            _shift_up2(v + skip),
        )
        return jnp.maximum(nxt, _NEG_INF)

    beta_c[:] = jax.lax.fori_loop(0, tt, body, beta_c[:])


def _slab_spec(t_tile, b_tile, sp):
    return pl.BlockSpec((t_tile, b_tile, sp), lambda i, j: (j, i, 0),
                        memory_space=pltpu.VMEM)


def _slab_spec_rev(t_tile, b_tile, sp, n_slabs):
    return pl.BlockSpec((t_tile, b_tile, sp),
                        lambda i, j: (n_slabs - 1 - j, i, 0),
                        memory_space=pltpu.VMEM)


def _row_spec(b_tile, width):
    return pl.BlockSpec((b_tile, width), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM)


def _pad_args(emit, skip, t_lengths, u_lengths, t_tile, b_tile):
    b, t, s = emit.shape
    pad_b = (-b) % b_tile
    pad_s = (-s) % 128
    pad_t = (-t) % t_tile
    if pad_s:
        emit = jnp.pad(emit, ((0, 0), (0, 0), (0, pad_s)),
                       constant_values=_NEG_INF)
        skip = jnp.pad(skip, ((0, 0), (0, pad_s)), constant_values=_NEG_INF)
    if pad_b:
        # dummy rows: emit = 0 on lane 0, t_len = 1, u_len = 0 -> nll 0
        emit = jnp.pad(emit, ((0, pad_b), (0, 0), (0, 0)))
        skip = jnp.pad(skip, ((0, pad_b), (0, 0)),
                       constant_values=_NEG_INF)
        t_lengths = jnp.pad(t_lengths, (0, pad_b), constant_values=1)
        u_lengths = jnp.pad(u_lengths, (0, pad_b))
    if pad_t:
        emit = jnp.pad(emit, ((0, 0), (0, pad_t), (0, 0)),
                       constant_values=_NEG_INF)
    emit_tm = emit.astype(jnp.float32).transpose(1, 0, 2)   # [T, B, S]
    return (emit_tm, skip.astype(jnp.float32),
            t_lengths.astype(jnp.int32)[:, None],
            u_lengths.astype(jnp.int32)[:, None],
            b + pad_b, t + pad_t, s + pad_s)


def _forward(emit, skip, t_lengths, u_lengths, t_tile, interpret):
    bt = _pick_b_tile(emit.shape[0])
    emit_tm, skip_p, tlen2, ulen2, bp, tp, sp = _pad_args(
        emit, skip, t_lengths, u_lengths, t_tile, bt
    )
    grid = (bp // bt, tp // t_tile)
    nll, alpha_tm = pl.pallas_call(
        _fwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((tp, bp, sp), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            _row_spec(bt, 1), _row_spec(bt, 1), _row_spec(bt, sp),
            _slab_spec(t_tile, bt, sp),
        ],
        out_specs=(_row_spec(bt, 1), _slab_spec(t_tile, bt, sp)),
        scratch_shapes=[pltpu.VMEM((bt, sp), jnp.float32)],
        interpret=interpret,
        # explicit scoped-vmem headroom: at b=24/U=64 flagship shapes the
        # default ~20.4 MB limit is exceeded by 32 KB when surrounding
        # kernels (e.g. the fused joint) shift operand layouts
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(tlen2, ulen2, skip_p, emit_tm)
    return nll[: emit.shape[0], 0], (emit_tm, skip_p, alpha_tm, tlen2,
                                     ulen2, nll)


def _backward(res, ct, b, t, s, t_tile, interpret):
    emit_tm, skip_p, alpha_tm, tlen2, ulen2, nll = res
    tp, bp, sp = emit_tm.shape
    bt = _pick_b_tile(b)
    g = jnp.zeros((bp, 1), jnp.float32).at[:b, 0].set(ct.astype(jnp.float32))
    n_slabs = tp // t_tile
    grid = (bp // bt, n_slabs)
    rev = _slab_spec_rev(t_tile, bt, sp, n_slabs)
    gemit_tm = pl.pallas_call(
        _bwd_kernel,
        out_shape=jax.ShapeDtypeStruct((tp, bp, sp), jnp.float32),
        grid=grid,
        in_specs=[
            _row_spec(bt, 1), _row_spec(bt, 1), _row_spec(bt, 1),
            _row_spec(bt, 1), _row_spec(bt, sp),
            rev, rev,
        ],
        out_specs=rev,
        scratch_shapes=[pltpu.VMEM((bt, sp), jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(tlen2, ulen2, -nll, g, skip_p, emit_tm, alpha_tm)
    return gemit_tm.transpose(1, 0, 2)[:b, :t, :s]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _ctc_nll_pallas(emit, skip, t_lengths, u_lengths, t_tile, interpret):
    nll, _ = _forward(emit, skip, t_lengths, u_lengths, t_tile, interpret)
    return nll


def _ctc_nll_fwd(emit, skip, t_lengths, u_lengths, t_tile, interpret):
    nll, res = _forward(emit, skip, t_lengths, u_lengths, t_tile, interpret)
    return nll, (res, emit.shape)


def _ctc_nll_bwd(t_tile, interpret, saved, ct):
    res, (b, t, s) = saved
    g_emit = _backward(res, ct, b, t, s, t_tile, interpret)
    return g_emit, None, None, None


_ctc_nll_pallas.defvjp(_ctc_nll_fwd, _ctc_nll_bwd)


def ctc_loss_pallas(
    log_probs: jax.Array,
    input_lengths: jax.Array,
    labels: jax.Array,
    label_lengths: jax.Array,
    blank: int = 0,
    *,
    t_tile: int = 128,
    interpret: bool | None = None,
) -> jax.Array:
    """Per-sequence CTC NLL [B] — drop-in for ops.ctc.ctc_loss (the XLA scan
    oracle), same torch-CTCLoss semantics. The [B,T,V] -> [B,T,S] extended-
    label selection runs as a one-hot matmul in XLA (exact at
    precision=HIGHEST; autodiff maps the cotangent back with a second
    matmul); the DP runs in the Pallas kernel with an analytic VJP."""
    from ..ctc import _extended_labels

    interpret = resolve_interpret(interpret)

    log_probs = log_probs.astype(jnp.float32)
    bsz, t_max, vocab = log_probs.shape
    u_max = labels.shape[1]
    s_max = 2 * u_max + 1

    ext = _extended_labels(labels, blank)                      # [B, S]
    ext_prev2 = jnp.pad(ext, ((0, 0), (2, 0)),
                        constant_values=blank)[:, :s_max]
    can_skip = (ext != blank) & (ext != ext_prev2)
    skip = jnp.where(can_skip, 0.0, _NEG_INF)
    # One-hot rows for out-of-range (padded) labels are all-zero -> emit 0
    # on those lanes; lanes past 2*label_len never reach the NLL readout
    # and carry zero occupancy gradient, so the value there is irrelevant.
    one_hot = jax.nn.one_hot(ext, vocab, dtype=jnp.float32)    # [B, S, V]
    emit = jnp.einsum(
        "btv,bsv->bts", log_probs, one_hot,
        precision=jax.lax.Precision.HIGHEST,
    )
    return _ctc_nll_pallas(
        emit, skip, input_lengths.astype(jnp.int32),
        label_lengths.astype(jnp.int32), t_tile, interpret,
    )
