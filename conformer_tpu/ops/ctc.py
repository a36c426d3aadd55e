"""CTC loss — pure JAX, log-space alpha recursion over time.

TPU-native equivalent of torch.nn.CTCLoss (cuDNN/C++) as used by the
reference (src/decoder.py:15,21). Semantics match CTCLoss(reduction='none'):
returns per-sequence negative log likelihood; callers apply the reference's
sum / max-label-length normalization (models/ctc_head.py).

The recursion runs as a `lax.scan` over time with a [B, S] carry
(S = 2*U_max + 1 interleaved-blank states), fully batched, static shapes,
differentiable by autodiff.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _extended_labels(labels: jax.Array, blank: int) -> jax.Array:
    """[B, U] -> [B, 2U+1] interleaved with blanks: b l1 b l2 ... lU b."""
    bsz, u = labels.shape
    ext = jnp.full((bsz, 2 * u + 1), blank, labels.dtype)
    return ext.at[:, 1::2].set(labels)


def ctc_loss(
    log_probs: jax.Array,
    input_lengths: jax.Array,
    labels: jax.Array,
    label_lengths: jax.Array,
    blank: int = 0,
) -> jax.Array:
    """Per-sequence CTC negative log likelihood.

    Args:
        log_probs: [B, T, V] log-softmax outputs (fp32 recommended).
        input_lengths: [B] valid frame counts.
        labels: [B, U] padded labels (pad value irrelevant beyond length).
        label_lengths: [B] valid label counts.
    Returns:
        [B] float32 losses (-log p(labels | inputs)).
    """
    log_probs = log_probs.astype(jnp.float32)
    bsz, t_max, _ = log_probs.shape
    u_max = labels.shape[1]
    s_max = 2 * u_max + 1

    ext = _extended_labels(labels, blank)                     # [B, S]
    # Whether a skip transition s-2 -> s is allowed: ext[s] != blank and
    # ext[s] != ext[s-2].
    ext_prev2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=blank)[:, :s_max]
    can_skip = (ext != blank) & (ext != ext_prev2)            # [B, S]
    s_idx = jnp.arange(s_max)

    # Gather per-time emission log-probs for extended labels: [B, T, S]
    emit = jnp.take_along_axis(
        log_probs, jnp.broadcast_to(ext[:, None, :], (bsz, t_max, s_max)), axis=2
    )

    alpha0 = jnp.where(s_idx[None, :] < 2, emit[:, 0, :], _NEG_INF)
    alpha0 = jnp.where(
        (s_idx[None, :] == 1) & (label_lengths[:, None] == 0), _NEG_INF, alpha0
    )

    def step(alpha, t):
        from_self = alpha
        from_prev = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=_NEG_INF)[:, :s_max]
        from_skip = jnp.where(
            can_skip,
            jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=_NEG_INF)[:, :s_max],
            _NEG_INF,
        )
        summed = jnp.logaddexp(jnp.logaddexp(from_self, from_prev), from_skip)
        new_alpha = summed + emit[:, t, :]
        new_alpha = jnp.maximum(new_alpha, _NEG_INF)  # avoid -inf accumulation
        active = (t < input_lengths)[:, None]
        return jnp.where(active, new_alpha, alpha), None

    alpha, _ = jax.lax.scan(step, alpha0, jnp.arange(1, t_max))

    s_last = 2 * label_lengths
    final_blank = jnp.take_along_axis(alpha, s_last[:, None], axis=1)[:, 0]
    final_label = jnp.take_along_axis(
        alpha, jnp.maximum(s_last - 1, 0)[:, None], axis=1
    )[:, 0]
    final_label = jnp.where(label_lengths > 0, final_label, _NEG_INF)
    return -jnp.logaddexp(final_blank, final_label)


def ctc_loss_from_logits(
    logits: jax.Array,
    input_lengths: jax.Array,
    labels: jax.Array,
    label_lengths: jax.Array,
    blank: int = 0,
) -> jax.Array:
    return ctc_loss(
        jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1),
        input_lengths,
        labels,
        label_lengths,
        blank,
    )
