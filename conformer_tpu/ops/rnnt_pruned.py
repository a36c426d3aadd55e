"""Pruned RNN-T loss (k2 "fast_rnnt"-style), pure JAX.

The full transducer loss evaluates the joint network on every (t, u) lattice
cell: B*T*U*J*V matmul FLOPs dominate the training step (the reference pays
this inside torchaudio's rnnt_loss on the full [B,T,U,V] tensor; its model
even carries the k2 pruning knobs lm_only_scale/am_only_scale unused,
/root/reference/src/model.py:24-26).

Two passes:
 1. "simple" joint: logits(t,u,v) = am(t,v) + lm(u,v) — no J-dim matmul;
    gives a trainable auxiliary loss AND per-cell occupancies (via autodiff)
    from which a monotone pruning band s_begin[t] of width s_range is built;
 2. full joint evaluated ONLY on the band: [B, T, s_range, J] x [J, V],
    cutting joint FLOPs/memory by (U+1)/s_range (~13x at LibriSpeech
    shapes), with the lattice DP run in band coordinates.

With s_range >= U+1 the band covers everything and the pruned loss equals
the full loss exactly (tested).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .rnnt import _semiring_linear_scan, rnnt_loss_from_log_probs

_NEG_INF = -1e30


def simple_lattice_log_probs(
    am: jax.Array,
    lm: jax.Array,
    labels: jax.Array,
    blank: int = 0,
    t_chunk: int = 64,
) -> tuple[jax.Array, jax.Array]:
    """(lp_blank, lp_emit) [B,T,U+1] for the additive "simple" joint
    am [B,T,V] + lm [B,U+1,V], chunked over T (elementwise + logsumexp only,
    no matmul)."""
    bsz, t_max, v = am.shape
    u1 = lm.shape[1]
    pad_t = (-t_max) % t_chunk
    am_p = jnp.pad(am, ((0, 0), (0, pad_t), (0, 0))) if pad_t else am
    n_chunks = am_p.shape[1] // t_chunk
    am_chunks = am_p.reshape(bsz, n_chunks, t_chunk, v).transpose(1, 0, 2, 3)
    lab = jnp.pad(labels, ((0, 0), (0, 1)), constant_values=blank)

    @jax.checkpoint
    def chunk_fn(am_c):
        logits = am_c[:, :, None, :].astype(jnp.float32) + lm[:, None, :, :].astype(
            jnp.float32
        )
        denom = jax.nn.logsumexp(logits, axis=-1)
        lpb = logits[..., blank] - denom
        emit = jnp.take_along_axis(
            logits,
            jnp.broadcast_to(lab[:, None, :, None], (bsz, am_c.shape[1], u1, 1)),
            axis=3,
        )[..., 0]
        return lpb, emit - denom

    lpb, lpe = jax.lax.map(chunk_fn, am_chunks)
    lpb = lpb.transpose(1, 0, 2, 3).reshape(bsz, -1, u1)[:, :t_max]
    lpe = lpe.transpose(1, 0, 2, 3).reshape(bsz, -1, u1)[:, :t_max]
    return lpb, lpe


def prune_bounds_from_occupancy(
    occupancy: jax.Array,
    t_lengths: jax.Array,
    u_lengths: jax.Array,
    s_range: int,
) -> jax.Array:
    """Monotone band starts s_begin [B, T] from lattice occupancies
    [B, T, U+1] (posterior cell usage, e.g. -d(simple_nll)/d(lp_blank)).

    Constraints enforced: 0 <= s_begin[t] <= U+1-s_range, non-decreasing,
    s_begin[0] = 0, and the terminal cell (t_len-1, u_len) inside the band.
    """
    bsz, t_max, u1 = occupancy.shape
    center = jnp.argmax(occupancy, axis=2).astype(jnp.int32)        # [B, T]
    s_begin = center - s_range // 2
    hi = jnp.maximum(u1 - s_range, 0)
    s_begin = jnp.clip(s_begin, 0, hi)
    # terminal coverage: at t_len-1 the band must contain u_len
    term_lo = jnp.maximum(u_lengths - s_range + 1, 0)               # [B]
    t_idx = jnp.arange(t_max)[None, :]
    at_term = t_idx == (t_lengths - 1)[:, None]
    s_begin = jnp.where(
        at_term, jnp.clip(s_begin, term_lo[:, None], hi), s_begin
    )
    # monotone non-decreasing with per-step increment < s_range (a larger
    # jump would shift the whole band past the previous one and sever the
    # blank transitions): s[t] = clip(raw[t], s[t-1], s[t-1]+s_range-1).
    s_begin = s_begin.at[:, 0].set(0)
    max_step = max(s_range - 1, 1)

    def mono(prev, raw):
        cur = jnp.clip(raw, prev, prev + max_step)
        return cur, cur

    _, s_t = jax.lax.scan(
        mono, jnp.zeros((bsz,), jnp.int32), jnp.swapaxes(s_begin, 0, 1)
    )
    s_begin = jnp.swapaxes(s_t, 0, 1)
    s_begin = jnp.minimum(s_begin, hi)

    # Backward pass: guarantee the terminal cell is reachable — walking back
    # from t_len-1 (where the band must contain u_len), each earlier band
    # may lag by at most max_step.
    def back(req, xs):
        s, is_term, before_term = xs
        s = jnp.where(is_term, jnp.clip(s, term_lo, hi), s)
        s = jnp.where(before_term, jnp.maximum(s, req - max_step), s)
        new_req = jnp.where(is_term | before_term, s, req)
        return new_req, s

    is_term_t = jnp.swapaxes(at_term, 0, 1)[::-1]
    before_t = jnp.swapaxes(t_idx < (t_lengths - 1)[:, None], 0, 1)[::-1]
    s_rev = jnp.swapaxes(s_begin, 0, 1)[::-1]
    _, s_fixed = jax.lax.scan(
        back, jnp.zeros((bsz,), jnp.int32), (s_rev, is_term_t, before_t)
    )
    s_begin = jnp.swapaxes(s_fixed[::-1], 0, 1)
    # The DP starts at cell (0, 0): the first band must begin at u = 0.
    return s_begin.at[:, 0].set(0)


def _gather_band(x: jax.Array, s_begin: jax.Array, s_range: int) -> jax.Array:
    """x [B, U1, ...] gathered to [B, T, S, ...] with u = s_begin[t]+s."""
    bsz, u1 = x.shape[0], x.shape[1]
    t_max = s_begin.shape[1]
    idx = jnp.clip(
        s_begin[:, :, None] + jnp.arange(s_range)[None, None, :], 0, u1 - 1
    )                                                               # [B,T,S]
    flat = jnp.reshape(idx, (bsz, -1))
    g = jnp.take_along_axis(
        x.reshape(bsz, u1, -1),
        flat[:, :, None].astype(jnp.int32),
        axis=1,
    )
    return g.reshape((bsz, t_max, s_range) + x.shape[2:])


def rnnt_loss_pruned(
    enc_proj: jax.Array,
    pred_proj: jax.Array,
    w_out: jax.Array,
    b_out: jax.Array,
    labels: jax.Array,
    s_begin: jax.Array,
    t_lengths: jax.Array,
    u_lengths: jax.Array,
    s_range: int,
    blank: int = 0,
    reduction: str = "none",
    t_chunk: int = 128,
) -> jax.Array:
    """Transducer NLL over the pruned band.

    Args:
        enc_proj: [B, T, J]; pred_proj: [B, U+1, J]; labels [B, U];
        s_begin: [B, T] monotone band starts (prune_bounds_from_occupancy).

    The band joint logits are produced and reduced chunk-by-chunk over T
    inside a rematerialized `lax.map` (same scheme as the full lattice,
    ops/rnnt.py): the [B, T, S, V] tensor (1.8 GB f32 at Conformer-M
    b=48) never materializes, which is what let the r4 pruned sweep OOM
    at b=48 before this change.
    """
    bsz, t_max, j_dim = enc_proj.shape
    u1 = pred_proj.shape[1]
    lab = jnp.pad(labels, ((0, 0), (0, 1)), constant_values=blank)   # [B,U1]

    pred_band = _gather_band(pred_proj, s_begin, s_range)            # [B,T,S,J]
    lab_band = _gather_band(lab[:, :, None], s_begin, s_range)[..., 0]

    t_chunk = min(t_chunk, t_max)
    pad_t = (-t_max) % t_chunk
    enc_p = jnp.pad(enc_proj, ((0, 0), (0, pad_t), (0, 0))) if pad_t else enc_proj
    predb_p = (
        jnp.pad(pred_band, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
        if pad_t else pred_band
    )
    labb_p = (
        jnp.pad(lab_band, ((0, 0), (0, pad_t), (0, 0))) if pad_t else lab_band
    )
    n_chunks = enc_p.shape[1] // t_chunk

    def to_chunks(x):
        return jnp.moveaxis(
            x.reshape((bsz, n_chunks, t_chunk) + x.shape[2:]), 1, 0
        )

    @jax.checkpoint
    def chunk_fn(args):
        enc_c, predb_c, labb_c = args                    # [B,tc,(S,)J/S]
        x = jnp.tanh(enc_c[:, :, None, :] + predb_c)
        logits = (
            jnp.einsum(
                "btsj,jv->btsv", x, w_out.astype(x.dtype),
                preferred_element_type=jnp.float32,
            )
            + b_out.astype(jnp.float32)
        )
        denom = jax.nn.logsumexp(logits, axis=-1)        # [B,tc,S]
        lpb = logits[..., blank] - denom
        lpe = jnp.take_along_axis(
            logits, labb_c[..., None].astype(jnp.int32), axis=3
        )[..., 0] - denom
        return lpb, lpe

    lpb_c, lpe_c = jax.lax.map(
        chunk_fn, (to_chunks(enc_p), to_chunks(predb_p), to_chunks(labb_p))
    )                                                    # [N,B,tc,S]
    lp_blank = jnp.moveaxis(lpb_c, 0, 1).reshape(bsz, -1, s_range)[:, :t_max]
    lp_emit = jnp.moveaxis(lpe_c, 0, 1).reshape(bsz, -1, s_range)[:, :t_max]
    # cells whose u index ran past U (clip in gather) are invalid for emit
    u_idx = s_begin[:, :, None] + jnp.arange(s_range)[None, None, :]
    lp_emit = jnp.where(u_idx <= u_lengths[:, None, None] - 1, lp_emit, _NEG_INF)

    # ---- band-coordinate DP -------------------------------------------
    emit_in = jnp.pad(
        lp_emit, ((0, 0), (0, 0), (1, 0)), constant_values=_NEG_INF
    )[:, :, :s_range]

    base0 = jnp.full((bsz, s_range), _NEG_INF).at[:, 0].set(0.0)
    alpha0 = _semiring_linear_scan(base0, emit_in[:, 0, :])
    s_pos = jnp.arange(s_range)

    def step(carry, t):
        alpha, final = carry
        d = (s_begin[:, t] - s_begin[:, t - 1])[:, None]             # [B,1]
        idx = jnp.clip(s_pos[None, :] + d, 0, s_range - 1)
        shifted_alpha = jnp.take_along_axis(alpha, idx, axis=1)
        shifted_blank = jnp.take_along_axis(
            lp_blank[:, t - 1, :], idx, axis=1
        )
        in_band = (s_pos[None, :] + d) < s_range
        base = jnp.where(in_band, shifted_alpha + shifted_blank, _NEG_INF)
        new_alpha = _semiring_linear_scan(base, emit_in[:, t, :])
        new_alpha = jnp.maximum(new_alpha, _NEG_INF)
        active = (t < t_lengths)[:, None]
        alpha = jnp.where(active, new_alpha, alpha)

        s_fin = jnp.clip(u_lengths - s_begin[:, t], 0, s_range - 1)
        a_u = jnp.take_along_axis(alpha, s_fin[:, None], axis=1)[:, 0]
        b_u = jnp.take_along_axis(lp_blank[:, t, :], s_fin[:, None], axis=1)[:, 0]
        final = jnp.where(t == t_lengths - 1, a_u + b_u, final)
        return (alpha, final), None

    s_fin0 = jnp.clip(u_lengths - s_begin[:, 0], 0, s_range - 1)
    a0 = jnp.take_along_axis(alpha0, s_fin0[:, None], axis=1)[:, 0]
    b0 = jnp.take_along_axis(lp_blank[:, 0, :], s_fin0[:, None], axis=1)[:, 0]
    final0 = jnp.where(t_lengths == 1, a0 + b0, _NEG_INF)

    (alpha, final), _ = jax.lax.scan(
        step, (alpha0, final0), jnp.arange(1, t_max)
    )
    nll = -final
    if reduction == "mean":
        return jnp.mean(nll)
    if reduction == "sum":
        return jnp.sum(nll)
    return nll


def rnnt_loss_pruned_full(
    am: jax.Array,
    lm: jax.Array,
    enc_proj: jax.Array,
    pred_proj: jax.Array,
    w_out: jax.Array,
    b_out: jax.Array,
    labels: jax.Array,
    t_lengths: jax.Array,
    u_lengths: jax.Array,
    s_range: int = 5,
    blank: int = 0,
    lattice_impl: str = "xla",
    simple_impl: str = "xla",
    t_chunk: int = 128,
) -> tuple[jax.Array, jax.Array]:
    """(simple_nll [B], pruned_nll [B]): the two-pass k2 recipe.

    am/lm are V-dim linear projections of encoder/predictor outputs;
    enc_proj/pred_proj are the J-dim joint projections.
    Pruning bounds come from the simple lattice's blank-occupancy gradient
    and do NOT receive gradients (stop_gradient).

    simple_impl="pallas" routes the simple-lattice scoring through the
    fused online-logsumexp kernel (ops/pallas/simple_lattice_kernel.py) —
    the [B, T, U+1, V] additive-logit tensor never reaches HBM.
    """
    from .rnnt import _lattice_nll

    if simple_impl == "pallas":
        from .pallas.simple_lattice_kernel import (
            simple_lattice_log_probs_pallas,
        )

        lp_blank_s, lp_emit_s = simple_lattice_log_probs_pallas(
            am.astype(jnp.float32), lm.astype(jnp.float32), labels, blank
        )
    else:
        lp_blank_s, lp_emit_s = simple_lattice_log_probs(am, lm, labels, blank)

    # Occupancies are only used for the (stop-gradient) pruning bounds, so
    # compute them on detached inputs — this also keeps the inner grad
    # first-order, which the Pallas kernel's custom VJP requires. With
    # lattice_impl="pallas" the occupancy comes straight out of the
    # kernel's analytic beta pass instead of autodiff through the XLA scan.
    lpb_ng = jax.lax.stop_gradient(lp_blank_s)
    lpe_ng = jax.lax.stop_gradient(lp_emit_s)

    def simple_nll_fn(lpb):
        return jnp.sum(
            _lattice_nll(lpb, lpe_ng, t_lengths, u_lengths, lattice_impl)
        )

    occ_grad = jax.grad(simple_nll_fn)(lpb_ng)
    simple_nll = _lattice_nll(
        lp_blank_s, lp_emit_s, t_lengths, u_lengths, lattice_impl
    )
    occupancy = -occ_grad                                             # [B,T,U1]
    s_begin = prune_bounds_from_occupancy(
        occupancy, t_lengths, u_lengths, s_range
    )
    s_begin = jax.lax.stop_gradient(s_begin)
    pruned_nll = rnnt_loss_pruned(
        enc_proj, pred_proj, w_out, b_out, labels, s_begin,
        t_lengths, u_lengths, s_range, blank, t_chunk=t_chunk,
    )
    return simple_nll, pruned_nll
