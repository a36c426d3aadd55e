"""RNN-T (transducer) loss — pure JAX lattice DP.

TPU-native equivalent of torchaudio.functional.rnnt_loss (C++/CUDA) as used
by the reference (src/model.py:107-112): forward DP over the (T, U) lattice,
log-space, mean reduction over the batch.

Design (SURVEY.md §7 "hard parts" #1):
  - scan over T with an [B, U+1] alpha-row carry;
  - the in-row recurrence alpha[t,u] = log+ (base[u], alpha[t,u-1]+emit[u-1])
    is a first-order linear recurrence in the (logaddexp, +) semiring and is
    evaluated with `lax.associative_scan` (O(log U) depth on the VPU instead
    of U sequential steps);
  - `rnnt_loss` takes the raw joint LOGITS and computes the log-normalizer +
    blank/label gathers directly, so the full [B,T,U,V] log-softmax is never
    materialized as a second tensor;
  - differentiable by autodiff (the Pallas kernel adds a custom VJP with the
    beta pass).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _semiring_linear_scan(base: jax.Array, weights: jax.Array) -> jax.Array:
    """Solve x[u] = logaddexp(base[u], x[u-1] + weights[u]) along axis -1.

    weights[0] is ignored (no incoming edge for u=0). Works on [..., U]
    batched arrays via an associative scan over composed affine maps
    f_u(x) = base_u (+) (weights_u (*) x) in the log semiring.
    """
    weights = weights.at[..., 0].set(_NEG_INF)

    def combine(f1, f2):
        a1, w1 = f1
        a2, w2 = f2
        return jnp.logaddexp(a2, w2 + a1), w1 + w2

    a_cum, _ = jax.lax.associative_scan(combine, (base, weights), axis=-1)
    return a_cum


def rnnt_loss_from_log_probs(
    lp_blank: jax.Array,
    lp_emit: jax.Array,
    t_lengths: jax.Array,
    u_lengths: jax.Array,
) -> jax.Array:
    """Transducer NLL from pre-gathered lattice log-probs.

    Args:
        lp_blank: [B, T, U+1] log p(blank | t, u).
        lp_emit:  [B, T, U+1] log p(label_{u+1} | t, u); column U is unused.
        t_lengths: [B] encoder lengths; u_lengths: [B] label lengths.
    Returns:
        [B] float32 negative log likelihoods.
    """
    lp_blank = lp_blank.astype(jnp.float32)
    lp_emit = lp_emit.astype(jnp.float32)
    bsz, t_max, u1 = lp_blank.shape

    # emission weight into u (from u-1): shift right
    emit_in = jnp.pad(lp_emit, ((0, 0), (0, 0), (1, 0)), constant_values=_NEG_INF)[
        :, :, :u1
    ]

    base0 = jnp.full((bsz, u1), _NEG_INF).at[:, 0].set(0.0)
    alpha0 = _semiring_linear_scan(base0, emit_in[:, 0, :])

    def step(carry, t):
        alpha, final = carry
        base = alpha + lp_blank[:, t - 1, :]
        new_alpha = _semiring_linear_scan(base, emit_in[:, t, :])
        new_alpha = jnp.maximum(new_alpha, _NEG_INF)
        active = (t < t_lengths)[:, None]
        alpha = jnp.where(active, new_alpha, alpha)
        # Contribution at t == t_len - 1: alpha[t, u_len] + blank[t, u_len]
        a_u = jnp.take_along_axis(alpha, u_lengths[:, None], axis=1)[:, 0]
        b_u = jnp.take_along_axis(
            lp_blank[:, t, :], u_lengths[:, None], axis=1
        )[:, 0]
        final = jnp.where(t == t_lengths - 1, a_u + b_u, final)
        return (alpha, final), None

    a_u0 = jnp.take_along_axis(alpha0, u_lengths[:, None], axis=1)[:, 0]
    b_u0 = jnp.take_along_axis(lp_blank[:, 0, :], u_lengths[:, None], axis=1)[:, 0]
    final0 = jnp.where(t_lengths == 1, a_u0 + b_u0, _NEG_INF)

    (alpha, final), _ = jax.lax.scan(
        step, (alpha0, final0), jnp.arange(1, t_max)
    )
    return -final


def gather_lattice_log_probs(
    logits: jax.Array, labels: jax.Array, blank: int
) -> tuple[jax.Array, jax.Array]:
    """From joint logits [B, T, U+1, V] and labels [B, U], compute
    (lp_blank, lp_emit) [B, T, U+1] without materializing log_softmax over V.
    """
    logits = logits.astype(jnp.float32)
    denom = jax.nn.logsumexp(logits, axis=-1)                 # [B, T, U+1]
    lp_blank = logits[..., blank] - denom
    bsz, t_max, u1, _ = logits.shape
    lab = jnp.pad(labels, ((0, 0), (0, 1)), constant_values=blank)  # [B, U+1]
    lab_b = jnp.broadcast_to(lab[:, None, :, None], (bsz, t_max, u1, 1))
    emit_logit = jnp.take_along_axis(logits, lab_b, axis=3)[..., 0]
    lp_emit = emit_logit - denom
    return lp_blank, lp_emit


def rnnt_lattice_log_probs_fused(
    enc_proj: jax.Array,
    pred_proj: jax.Array,
    w_out: jax.Array,
    b_out: jax.Array,
    labels: jax.Array,
    blank: int = 0,
    t_chunk: int = 32,
) -> tuple[jax.Array, jax.Array]:
    """(lp_blank, lp_emit) [B, T, U+1] WITHOUT materializing [B, T, U+1, V].

    The joint logits are produced and reduced chunk-by-chunk over T inside a
    rematerialized `lax.map`, so peak memory is O(B * t_chunk * U * V) and
    the backward pass recomputes each chunk (the [B,T,U,V] tensor is the
    reference's training memory hotspot — torchaudio takes it fully
    materialized, src/model.py:107-112; a v5e chip cannot hold it at the
    Conformer-M batch sizes). The inner computation is one MXU matmul
    [B*t_chunk*(U+1), J] x [J, V] plus logsumexp + two gathers.

    Args:
        enc_proj: [B, T, J] joint-projected encoder output.
        pred_proj: [B, U+1, J] joint-projected predictor output.
        w_out/b_out: joint output projection [J, V] / [V].
        labels: [B, U].
    """
    bsz, t_max, j_dim = enc_proj.shape
    u1 = pred_proj.shape[1]
    t_chunk = min(t_chunk, t_max)  # short utterances: no padded-chunk waste
    pad_t = (-t_max) % t_chunk
    if pad_t:
        enc_proj = jnp.pad(enc_proj, ((0, 0), (0, pad_t), (0, 0)))
    n_chunks = enc_proj.shape[1] // t_chunk
    enc_chunks = enc_proj.reshape(bsz, n_chunks, t_chunk, j_dim).transpose(
        1, 0, 2, 3
    )
    lab = jnp.pad(labels, ((0, 0), (0, 1)), constant_values=blank)  # [B, U+1]

    @jax.checkpoint
    def chunk_fn(enc_c):
        # enc_c: [B, tc, J]
        x = enc_c[:, :, None, :] + pred_proj[:, None, :, :]       # [B,tc,U1,J]
        x = jnp.tanh(x)
        logits = (
            jnp.einsum(
                "btuj,jv->btuv", x, w_out.astype(x.dtype),
                preferred_element_type=jnp.float32,
            )
            + b_out.astype(jnp.float32)
        )
        denom = jax.nn.logsumexp(logits, axis=-1)
        lpb = logits[..., blank] - denom
        emit_logit = jnp.take_along_axis(
            logits, jnp.broadcast_to(lab[:, None, :, None], (bsz, enc_c.shape[1], u1, 1)),
            axis=3,
        )[..., 0]
        return lpb, emit_logit - denom

    lpb, lpe = jax.lax.map(chunk_fn, enc_chunks)                  # [N,B,tc,U1]
    lpb = lpb.transpose(1, 0, 2, 3).reshape(bsz, -1, u1)[:, :t_max]
    lpe = lpe.transpose(1, 0, 2, 3).reshape(bsz, -1, u1)[:, :t_max]
    return lpb, lpe


def _lattice_nll(lp_blank, lp_emit, t_lengths, u_lengths, lattice_impl):
    if lattice_impl == "pallas":
        from .pallas.rnnt_kernel import rnnt_loss_from_log_probs_pallas

        return rnnt_loss_from_log_probs_pallas(
            lp_blank, lp_emit, t_lengths, u_lengths
        )
    return rnnt_loss_from_log_probs(lp_blank, lp_emit, t_lengths, u_lengths)


def rnnt_loss_fused(
    enc_proj: jax.Array,
    pred_proj: jax.Array,
    w_out: jax.Array,
    b_out: jax.Array,
    labels: jax.Array,
    t_lengths: jax.Array,
    u_lengths: jax.Array,
    blank: int = 0,
    reduction: str = "mean",
    t_chunk: int = 32,
    lattice_impl: str = "xla",
    joint_impl: str = "xla",
) -> jax.Array:
    """Memory-efficient transducer loss from joint-projected activations.

    joint_impl="pallas" computes (lp_blank, lp_emit) with the fused
    on-chip joint kernel (ops/pallas/joint_kernel.py — W resident in VMEM,
    online logsumexp over V tiles, analytic VJP) instead of the
    rematerialized XLA chunk map."""
    if joint_impl == "pallas":
        from .pallas.joint_kernel import joint_lattice_log_probs_pallas

        lab = jnp.pad(labels, ((0, 0), (0, 1)), constant_values=blank)
        lp_blank, lp_emit = joint_lattice_log_probs_pallas(
            enc_proj, pred_proj, w_out, b_out, lab, blank
        )
    else:
        lp_blank, lp_emit = rnnt_lattice_log_probs_fused(
            enc_proj, pred_proj, w_out, b_out, labels, blank, t_chunk
        )
    nll = _lattice_nll(lp_blank, lp_emit, t_lengths, u_lengths, lattice_impl)
    if reduction == "mean":
        return jnp.mean(nll)
    if reduction == "sum":
        return jnp.sum(nll)
    return nll


def rnnt_loss(
    logits: jax.Array,
    labels: jax.Array,
    t_lengths: jax.Array,
    u_lengths: jax.Array,
    blank: int = 0,
    reduction: str = "mean",
    lattice_impl: str = "xla",
) -> jax.Array:
    """Transducer loss from joint logits (torchaudio.functional.rnnt_loss
    semantics, reference src/model.py:107-112).

    Args:
        logits: [B, T, U+1, V] joint outputs (row u consumed u labels).
        labels: [B, U] int32; t_lengths/u_lengths: [B].
    """
    lp_blank, lp_emit = gather_lattice_log_probs(logits, labels, blank)
    nll = _lattice_nll(lp_blank, lp_emit, t_lengths, u_lengths, lattice_impl)
    if reduction == "mean":
        return jnp.mean(nll)
    if reduction == "sum":
        return jnp.sum(nll)
    return nll
