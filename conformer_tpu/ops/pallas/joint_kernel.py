"""Fused transducer joint-lattice Pallas kernel (forward + custom VJP).

Computes the pre-gathered lattice log-probs

    lp_blank[b,t,u] = log softmax(tanh(enc[b,t] + pred[b,u]) @ W + bias)[blank]
    lp_emit [b,t,u] = ... [labels[b,u]]

directly from the joint-projected activations, streaming V in tiles with an
online logsumexp — the [B, T, U+1, V] joint tensor (the reference's training
memory hotspot, consumed whole by torchaudio's rnnt_loss,
/root/reference/src/model.py:107-112) never exists, in HBM or anywhere.

vs the XLA path (ops/rnnt.rnnt_lattice_log_probs_fused): XLA materializes
each [B, tc, U1, V] logits chunk in HBM between the matmul and the
logsumexp (~12 GB of traffic per Conformer-M step with the rematerialized
backward); here W lives in VMEM (bf16) and each logits tile dies in
registers.

Backward is analytic (custom VJP), split into two kernels so every
accumulator has consecutive grid revisits:
  - K_A, grid (b, t-tile): recomputes X = tanh(enc+pred) and the softmax
    from the saved logZ, accumulates dX over V tiles in VMEM, emits
    d(enc) tiles and accumulates d(pred) across the whole grid;
  - K_B, grid (v-tile, b): accumulates dW/db for its V tile across all
    (b, t), recomputing X and the softmax tile on the fly.

d logits[tu,v] = g_b[tu]*(1[v=blank] - p[v]) + g_e[tu]*(1[v=lab_u] - p[v]).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._compat import resolve_interpret

_NEG = -1e30


def _mk_masks(lab, blank, off, vt, u1):
    """(blank_mask [1,1,VT], lab_mask [1,U1,VT]) for the V tile at `off`."""
    col = jax.lax.broadcasted_iota(jnp.int32, (u1, vt), 1)
    lab_mask = (lab[:, None] - off) == col                   # [U1, VT]
    blank_mask = (col[0:1, :] + off) == blank                # [1, VT]
    return blank_mask[None], lab_mask[None]


def _fwd_kernel(
    lab_ref,   # [1, 1, U1] int32
    e_ref,     # [1, TT, J]
    p_ref,     # [1, U1, J]
    w_ref,     # [J, Vp] (bf16-resident)
    b_ref,     # [1, Vp] f32
    lpb_ref,   # [1, TT, U1] f32 out
    lpe_ref,   # [1, TT, U1] f32 out
    logz_ref,  # [1, TT, U1] f32 out
    x_c,       # [TT*U1, J] scratch (input dtype)
    *,
    blank: int,
    v_tile: int,
):
    tu, j = x_c.shape
    tt = e_ref.shape[1]
    u1 = p_ref.shape[1]
    n_v = w_ref.shape[1] // v_tile
    # rank-3 lhs would lower as TT batched [U1, J] matmuls; flatten to one
    # [TT*U1, J] matmul (the merge is layout-preserving: U1 is lane-aligned)
    x_c[:] = jnp.tanh(
        e_ref[0][:, None, :] + p_ref[0][None, :, :]
    ).astype(x_c.dtype).reshape(tu, j)
    lab = lab_ref[0, 0]

    def body(vi, carry):
        m, s, bl, em = carry
        off = vi * v_tile
        wv = w_ref[:, pl.ds(off, v_tile)]
        logits = (jax.lax.dot_general(
            x_c[:], wv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[0, pl.ds(off, v_tile)][None, :]).reshape(tt, u1, v_tile)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        s = s * jnp.exp(m - m_new) + jnp.sum(
            jnp.exp(logits - m_new[..., None]), axis=-1
        )
        blank_mask, lab_mask = _mk_masks(lab, blank, off, v_tile, u1)
        bl = bl + jnp.sum(jnp.where(blank_mask, logits, 0.0), axis=-1)
        em = em + jnp.sum(jnp.where(lab_mask, logits, 0.0), axis=-1)
        return m_new, s, bl, em

    m0 = jnp.full((tt, u1), _NEG, jnp.float32)
    z0 = jnp.zeros((tt, u1), jnp.float32)
    m, s, bl, em = jax.lax.fori_loop(0, n_v, body, (m0, z0, z0, z0))
    logz = m + jnp.log(s)
    lpb_ref[0] = bl - logz
    lpe_ref[0] = em - logz
    logz_ref[0] = logz


def _dlogits(logits, logz, g_b, g_e, blank_mask, lab_mask):
    p = jnp.exp(logits - logz[..., None])
    g = (g_b + g_e)[..., None]
    return (
        -g * p
        + jnp.where(blank_mask, g_b[..., None], 0.0)
        + jnp.where(lab_mask, g_e[..., None], 0.0)
    )


def _bwd_xp_kernel(
    lab_ref,   # [1, 1, U1] int32
    e_ref,     # [1, TT, J]
    p_ref,     # [1, U1, J]
    w_ref,     # [J, Vp]
    b_ref,     # [1, Vp]
    logz_ref,  # [1, TT, U1]
    gb_ref,    # [1, TT, U1]
    ge_ref,    # [1, TT, U1]
    de_ref,    # [1, TT, J] f32 out
    dp_ref,    # [1, U1, J] f32 out (accumulated across this row's t tiles)
    x_c,       # [TT*U1, J] scratch
    dx_c,      # [TT*U1, J] f32 scratch
    *,
    blank: int,
    v_tile: int,
):
    tu, j = x_c.shape
    tt = e_ref.shape[1]
    u1 = p_ref.shape[1]
    n_v = w_ref.shape[1] // v_tile
    first_t = pl.program_id(1) == 0

    x_c[:] = jnp.tanh(
        e_ref[0][:, None, :] + p_ref[0][None, :, :]
    ).astype(x_c.dtype).reshape(tu, j)
    dx_c[:] = jnp.zeros((tu, j), jnp.float32)
    lab = lab_ref[0, 0]
    logz = logz_ref[0]
    g_b = gb_ref[0]
    g_e = ge_ref[0]

    def body(vi, _):
        off = vi * v_tile
        wv = w_ref[:, pl.ds(off, v_tile)]
        logits = (jax.lax.dot_general(
            x_c[:], wv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[0, pl.ds(off, v_tile)][None, :]).reshape(tt, u1, v_tile)
        blank_mask, lab_mask = _mk_masks(lab, blank, off, v_tile, u1)
        dl = _dlogits(logits, logz, g_b, g_e, blank_mask, lab_mask)
        dx_c[:] += jax.lax.dot_general(
            dl.reshape(tu, v_tile), wv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, n_v, body, 0)
    xf = x_c[:].astype(jnp.float32)
    dpre = (dx_c[:] * (1.0 - xf * xf)).reshape(tt, u1, j)
    de_ref[0] = jnp.sum(dpre, axis=1)

    @pl.when(first_t)
    def _():
        dp_ref[0] = jnp.zeros((u1, j), jnp.float32)

    dp_ref[0] += jnp.sum(dpre, axis=0)


def _bwd_w_kernel(
    lab_ref,   # [1, 1, U1] int32 (block per b)
    e_ref,     # [1, Tp, J]
    p_ref,     # [1, U1, J]
    wv_ref,    # [J, VT] (block per v-tile)
    bv_ref,    # [1, VT]
    logz_ref,  # [1, Tp, U1]
    gb_ref,    # [1, Tp, U1]
    ge_ref,    # [1, Tp, U1]
    dw_ref,    # [J, VT] f32 out (accumulated across b)
    db_ref,    # [1, VT] f32 out
    dw_c,      # [J, VT] f32 scratch
    db_c,      # [1, VT] f32 scratch
    x_c,       # [TT*U1, J] scratch
    dl_c,      # [TT*U1, VT] f32 scratch
    *,
    blank: int,
    t_tile: int,
):
    vi = pl.program_id(0)
    bi = pl.program_id(1)
    n_b = pl.num_programs(1)
    u1, j = p_ref.shape[1], p_ref.shape[2]
    t_p = e_ref.shape[1]
    n_t = t_p // t_tile
    vt = wv_ref.shape[1]
    off = vi * vt
    lab = lab_ref[0, 0]
    blank_mask, lab_mask = _mk_masks(lab, blank, off, vt, u1)

    @pl.when(bi == 0)
    def _():
        dw_c[:] = jnp.zeros((j, vt), jnp.float32)
        db_c[:] = jnp.zeros((1, vt), jnp.float32)

    tu = t_tile * u1

    def body(ti, _):
        t0 = ti * t_tile
        x_c[:] = jnp.tanh(
            e_ref[0, pl.ds(t0, t_tile)][:, None, :] + p_ref[0][None, :, :]
        ).astype(x_c.dtype).reshape(tu, j)
        logits = (jax.lax.dot_general(
            x_c[:], wv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bv_ref[0][None, :]).reshape(t_tile, u1, vt)
        dl_c[:] = _dlogits(
            logits,
            logz_ref[0, pl.ds(t0, t_tile)],
            gb_ref[0, pl.ds(t0, t_tile)],
            ge_ref[0, pl.ds(t0, t_tile)],
            blank_mask, lab_mask,
        ).reshape(tu, vt)
        # one [J, TU] x [TU, VT] matmul: dw += x^T @ dl
        dw_c[:] += jax.lax.dot_general(
            x_c[:], dl_c[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db_c[:] += jnp.sum(dl_c[:], axis=0)[None, :]
        return 0

    jax.lax.fori_loop(0, n_t, body, 0)

    @pl.when(bi == n_b - 1)
    def _():
        dw_ref[:] = dw_c[:]
        db_ref[:] = db_c[:]


def _pad_inputs(enc_proj, pred_proj, w, b, labels, t_tile, v_tile):
    bsz, t, j = enc_proj.shape
    u1 = pred_proj.shape[1]
    v = w.shape[1]
    pad_t = (-t) % t_tile
    pad_u = (-u1) % 128
    pad_v = (-v) % v_tile
    if pad_t:
        enc_proj = jnp.pad(enc_proj, ((0, 0), (0, pad_t), (0, 0)))
    if pad_u:
        pred_proj = jnp.pad(pred_proj, ((0, 0), (0, pad_u), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad_u)))
    if pad_v:
        w = jnp.pad(w, ((0, 0), (0, pad_v)))
        # -inf bias: padded vocab entries vanish from the logsumexp
        b = jnp.pad(b, (0, pad_v), constant_values=_NEG)
    return enc_proj, pred_proj, w, b, labels.astype(jnp.int32)[:, None, :]


def _forward(enc_proj, pred_proj, w, b, labels, blank, t_tile, v_tile,
             interpret):
    bsz, t, j = enc_proj.shape
    u1 = pred_proj.shape[1]
    e_p, p_p, w_p, b_p, lab_p = _pad_inputs(
        enc_proj, pred_proj, w, b, labels, t_tile, v_tile
    )
    tp, u1p, vp = e_p.shape[1], p_p.shape[1], w_p.shape[1]
    w_p = w_p.astype(enc_proj.dtype)
    b_p = b_p.astype(jnp.float32)[None, :]
    grid = (bsz, tp // t_tile)
    out_spec = pl.BlockSpec((1, t_tile, u1p), lambda bi, ti: (bi, ti, 0),
                            memory_space=pltpu.VMEM)
    lpb, lpe, logz = pl.pallas_call(
        functools.partial(_fwd_kernel, blank=blank, v_tile=v_tile),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, tp, u1p), jnp.float32),
            jax.ShapeDtypeStruct((bsz, tp, u1p), jnp.float32),
            jax.ShapeDtypeStruct((bsz, tp, u1p), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, u1p), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_tile, j), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, u1p, j), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((j, vp), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vp), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec, out_spec),
        scratch_shapes=[pltpu.VMEM((t_tile * u1p, j), e_p.dtype)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(lab_p, e_p, p_p, w_p, b_p)
    return (
        lpb[:, :t, :u1],
        lpe[:, :t, :u1],
        (e_p, p_p, w_p, b_p, lab_p, logz),
    )


def _backward(res, g_blank, g_emit, blank, t_tile, v_tile, interpret,
              out_dtypes):
    e_p, p_p, w_p, b_p, lab_p, logz = res
    bsz, tp, j = e_p.shape
    u1p = p_p.shape[1]
    vp = w_p.shape[1]
    if vp % v_tile:
        # V was padded to the (possibly smaller) forward tile; fall back to
        # the largest tile that divides it.
        v_tile = vp if vp <= v_tile else next(
            s for s in range(v_tile, 0, -1) if vp % s == 0
        )
    t, u1 = g_blank.shape[1], g_blank.shape[2]
    gb = jnp.zeros((bsz, tp, u1p), jnp.float32).at[:, :t, :u1].set(
        g_blank.astype(jnp.float32)
    )
    ge = jnp.zeros((bsz, tp, u1p), jnp.float32).at[:, :t, :u1].set(
        g_emit.astype(jnp.float32)
    )

    lat_spec = pl.BlockSpec((1, t_tile, u1p), lambda bi, ti: (bi, ti, 0),
                            memory_space=pltpu.VMEM)
    de, dp = pl.pallas_call(
        functools.partial(_bwd_xp_kernel, blank=blank, v_tile=v_tile),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, tp, j), jnp.float32),
            jax.ShapeDtypeStruct((bsz, u1p, j), jnp.float32),
        ),
        grid=(bsz, tp // t_tile),
        in_specs=[
            pl.BlockSpec((1, 1, u1p), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_tile, j), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, u1p, j), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((j, vp), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vp), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            lat_spec, lat_spec, lat_spec,
        ],
        out_specs=(
            pl.BlockSpec((1, t_tile, j), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, u1p, j), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((t_tile * u1p, j), e_p.dtype),
            pltpu.VMEM((t_tile * u1p, j), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(lab_p, e_p, p_p, w_p, b_p, logz, gb, ge)

    full_t_spec = pl.BlockSpec((1, tp, u1p), lambda vi, bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM)
    dw, db = pl.pallas_call(
        functools.partial(_bwd_w_kernel, blank=blank, t_tile=t_tile),
        out_shape=(
            jax.ShapeDtypeStruct((j, vp), jnp.float32),
            jax.ShapeDtypeStruct((1, vp), jnp.float32),
        ),
        grid=(vp // v_tile, bsz),
        in_specs=[
            pl.BlockSpec((1, 1, u1p), lambda vi, bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, j), lambda vi, bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, u1p, j), lambda vi, bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((j, v_tile), lambda vi, bi: (0, vi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v_tile), lambda vi, bi: (0, vi),
                         memory_space=pltpu.VMEM),
            full_t_spec, full_t_spec, full_t_spec,
        ],
        out_specs=(
            pl.BlockSpec((j, v_tile), lambda vi, bi: (0, vi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v_tile), lambda vi, bi: (0, vi),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((j, v_tile), jnp.float32),
            pltpu.VMEM((1, v_tile), jnp.float32),
            pltpu.VMEM((t_tile * u1p, j), e_p.dtype),
            pltpu.VMEM((t_tile * u1p, v_tile), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(lab_p, e_p, p_p, w_p, b_p, logz, gb, ge)

    t_orig, u1_orig, v_orig = out_dtypes["t"], out_dtypes["u1"], out_dtypes["v"]
    return (
        de[:, :t_orig].astype(out_dtypes["enc"]),
        dp[:, :u1_orig].astype(out_dtypes["pred"]),
        dw[:, :v_orig].astype(out_dtypes["w"]),
        db[0, :v_orig].astype(out_dtypes["b"]),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _joint_lattice(enc_proj, pred_proj, w, b, labels,
                   blank, t_tile, v_tile, v_tile_bwd, interpret,
                   v_orig, wb_dtypes):
    lpb, lpe, _ = _forward(enc_proj, pred_proj, w, b, labels, blank,
                           t_tile, v_tile, interpret)
    return lpb, lpe


def _joint_lattice_fwd(enc_proj, pred_proj, w, b, labels,
                       blank, t_tile, v_tile, v_tile_bwd, interpret,
                       v_orig, wb_dtypes):
    lpb, lpe, res = _forward(enc_proj, pred_proj, w, b, labels, blank,
                             t_tile, v_tile, interpret)
    return (lpb, lpe), res


def _joint_lattice_bwd(blank, t_tile, v_tile, v_tile_bwd, interpret,
                       v_orig, wb_dtypes, res, cts):
    g_blank, g_emit = cts
    e_p, p_p = res[0], res[1]
    meta = {
        "t": g_blank.shape[1], "u1": g_blank.shape[2], "v": v_orig,
        "enc": e_p.dtype, "pred": p_p.dtype,
        "w": jnp.dtype(wb_dtypes[0]), "b": jnp.dtype(wb_dtypes[1]),
    }
    de, dp, dw, db = _backward(res, g_blank, g_emit, blank,
                               t_tile, v_tile_bwd, interpret, meta)
    return de, dp, dw, db, None


_joint_lattice.defvjp(_joint_lattice_fwd, _joint_lattice_bwd)


def joint_lattice_log_probs_pallas(
    enc_proj: jax.Array,
    pred_proj: jax.Array,
    w_out: jax.Array,
    b_out: jax.Array,
    labels: jax.Array,
    blank: int = 0,
    *,
    t_tile: int = 16,
    v_tile: int = 1024,
    v_tile_bwd: int = 512,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """(lp_blank, lp_emit) [B, T, U+1] — drop-in for
    ops.rnnt.rnnt_lattice_log_probs_fused (same math, fused on-chip).

    labels here are the PADDED label row [B, U+1] (label u+1 at row u;
    the last row gathers blank, matching the XLA gather path)."""
    interpret = resolve_interpret(interpret)
    return _joint_lattice(
        enc_proj, pred_proj, w_out, b_out, labels,
        blank, t_tile, v_tile, v_tile_bwd, interpret,
        w_out.shape[1], (w_out.dtype.name, b_out.dtype.name),
    )

