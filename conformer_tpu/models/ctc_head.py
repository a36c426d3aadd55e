"""CTC head: linear projection to vocab + loss wrapper.

Reference: src/decoder.py:7-23 (CTCDecoder). Keeps the reference's quirky
normalization: CTCLoss(reduction='sum') divided by the MAX label length
(src/decoder.py:22), not the batch size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.ctc import ctc_loss as _ctc_loss
from . import layers
from .layers import Params


def init_ctc_head(rng, cfg: ModelConfig) -> Params:
    return {"ctc_lo": layers.init_dense(rng, cfg.encoder_dim, cfg.vocab_size)}


def ctc_logits(
    p: Params,
    encoder_out: jax.Array,
    *,
    dropout_rate: float = 0.0,
    rng: jax.Array | None = None,
    deterministic: bool = True,
) -> jax.Array:
    x = layers.dropout(rng, encoder_out, dropout_rate, deterministic)
    return layers.dense(p["ctc_lo"], x)


def ctc_head_loss(
    p: Params,
    encoder_out: jax.Array,
    encoder_out_lens: jax.Array,
    labels: jax.Array,
    label_lengths: jax.Array,
    cfg: ModelConfig,
    *,
    rng: jax.Array | None = None,
    deterministic: bool = True,
    row_valid: jax.Array | None = None,
) -> jax.Array:
    logits = ctc_logits(
        p, encoder_out, dropout_rate=cfg.dropout, rng=rng, deterministic=deterministic
    )
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    if cfg.use_pallas_ctc:
        from ..ops.pallas.ctc_kernel import ctc_loss_pallas

        per_seq = ctc_loss_pallas(
            log_probs, encoder_out_lens, labels, label_lengths, blank=cfg.blank_id
        )
    else:
        per_seq = _ctc_loss(
            log_probs, encoder_out_lens, labels, label_lengths, blank=cfg.blank_id
        )
    if row_valid is not None:
        per_seq = jnp.where(row_valid, per_seq, 0.0)
    # reduction='sum' / max label length (reference decoder.py:21-22)
    return jnp.sum(per_seq) / labels.shape[1]
