"""Attention (transformer) decoder + label-smoothing loss.

The reference declares TransformerDecoder / BiTransformerDecoder
(src/decoder.py:26-121, src/decoder_layer.py:7-63) and a LabelSmoothingLoss
(src/label_smoothing_loss.py:6-80) but never trains them — the attention
loss is commented out of Transducer.forward (src/model.py:85,89) and the
decoder layer would crash if enabled (it passes the attention module's
(out, cache) tuple into dropout, src/decoder_layer.py:51-57). This is the
WORKING rebuild: left-to-right decoder, optional right-to-left decoder for
bidirectional training / rescoring, and the smoothed CE loss, wired into
the joint loss via cfg.attention_weight.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from . import attention, embedding, feedforward, layers, masks
from .layers import Params


def init_decoder_layer(rng, cfg: ModelConfig) -> Params:
    k1, k2, k3 = jax.random.split(rng, 3)
    d = cfg.encoder_dim
    return {
        "self_attn": attention.init_mhsa(k1, d, cfg.num_heads, relative=False),
        "src_attn": attention.init_mhsa(k2, d, cfg.num_heads, relative=False),
        "feed_forward": feedforward.init_ffn(k3, d, cfg.decoder_hidden_dim),
        "norm1": layers.init_layer_norm(d),
        "norm2": layers.init_layer_norm(d),
        "norm3": layers.init_layer_norm(d),
    }


def init_transformer_decoder(rng, cfg: ModelConfig, num_layers: int) -> Params:
    k_embed, k_layers, k_out = jax.random.split(rng, 3)
    layer_keys = jax.random.split(k_layers, num_layers)
    stacked = jax.vmap(lambda k: init_decoder_layer(k, cfg))(layer_keys)
    return {
        "embed": layers.init_embedding(k_embed, cfg.vocab_size, cfg.encoder_dim),
        "pos_table": embedding.sinusoid_table(cfg.max_len, cfg.encoder_dim),
        "layers": stacked,
        "after_norm": layers.init_layer_norm(cfg.encoder_dim),
        "output_layer": layers.init_dense(k_out, cfg.encoder_dim, cfg.vocab_size),
    }


def transformer_decoder_forward(
    p: Params,
    memory: jax.Array,
    memory_pad_mask: jax.Array,
    targets_in: jax.Array,
    target_lengths: jax.Array,
    cfg: ModelConfig,
    *,
    rng: jax.Array | None = None,
    deterministic: bool = True,
) -> jax.Array:
    """targets_in [B, U] (sos-prefixed) -> logits [B, U, V].

    Pre-norm layers: causal self-attn -> cross-attn over encoder memory ->
    FFN; memory keys masked by the encoder pad mask.
    """
    bsz, u = targets_in.shape
    x = layers.embedding(p["embed"], targets_in, dtype=jnp.dtype(cfg.compute_dtype))
    x = x * jnp.sqrt(jnp.asarray(cfg.encoder_dim, x.dtype))
    pe = embedding.absolute_pos_embed(p["pos_table"], 0, u).astype(x.dtype)
    x = x + pe[None]

    tgt_valid = masks.make_non_pad_mask(target_lengths, u)         # [B, U]
    self_mask = (
        tgt_valid[:, None, :] & masks.make_subsequent_mask(u)[None, :, :]
    )
    cross_mask = jnp.broadcast_to(
        memory_pad_mask[:, None, :], (bsz, u, memory.shape[1])
    )
    mem = memory.astype(x.dtype)

    def body(carry, scan_in):
        (x,) = carry
        lp, idx = scan_in
        r = (
            jax.random.fold_in(rng, idx) if rng is not None else None
        )
        rs = jax.random.split(r, 3) if r is not None else [None] * 3
        y = layers.layer_norm(lp["norm1"], x)
        y, _ = attention.mhsa(
            lp["self_attn"], y, y, self_mask, num_heads=cfg.num_heads,
            dropout_rate=cfg.attention_dropout, rng=rs[0],
            deterministic=deterministic,
        )
        x = x + layers.dropout(rs[0], y, cfg.dropout, deterministic)
        y = layers.layer_norm(lp["norm2"], x)
        y, _ = attention.mhsa(
            lp["src_attn"], y, mem, cross_mask, num_heads=cfg.num_heads,
            dropout_rate=cfg.attention_dropout, rng=rs[1],
            deterministic=deterministic,
        )
        x = x + layers.dropout(rs[1], y, cfg.dropout, deterministic)
        y = layers.layer_norm(lp["norm3"], x)
        y = feedforward.ffn(
            lp["feed_forward"], y, dropout_rate=cfg.dropout,
            rng=rs[2], deterministic=deterministic,
        )
        x = x + layers.dropout(rs[2], y, cfg.dropout, deterministic)
        return (x,), None

    idxs = jnp.arange(jax.tree.leaves(p["layers"])[0].shape[0])
    (x,), _ = jax.lax.scan(body, (x,), (p["layers"], idxs))
    x = layers.layer_norm(p["after_norm"], x)
    return layers.dense(p["output_layer"], x)


def init_bi_decoder(rng, cfg: ModelConfig, r_num_layers: int = 0) -> Params:
    """L2R decoder + optional R2L decoder (reference BiTransformerDecoder,
    src/decoder.py:76-121)."""
    k1, k2 = jax.random.split(rng)
    p: Params = {
        "left_decoder": init_transformer_decoder(k1, cfg, cfg.decoder_num_layers)
    }
    if r_num_layers > 0:
        p["right_decoder"] = init_transformer_decoder(k2, cfg, r_num_layers)
    return p


def label_smoothing_loss(
    logits: jax.Array,
    targets: jax.Array,
    smoothing: float,
    ignore_id: int = -1,
    normalize_length: bool = False,
) -> jax.Array:
    """KL-divergence label-smoothed CE (reference label_smoothing_loss.py:
    6-80): smoothed target = (1-eps) one-hot + eps/(V-1); padded positions
    masked; normalized by batch size (or token count)."""
    bsz, u, v = logits.shape
    logits = logits.reshape(-1, v).astype(jnp.float32)
    targets_f = targets.reshape(-1)
    valid = targets_f != ignore_id
    tgt = jnp.where(valid, targets_f, 0)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    confidence = 1.0 - smoothing
    off_value = smoothing / (v - 1)
    true_full = jnp.full((targets_f.shape[0], v), off_value, jnp.float32)
    one_hot = jax.nn.one_hot(tgt, v, dtype=jnp.float32)
    true_full = true_full * (1 - one_hot) + one_hot * confidence
    kl = jnp.sum(true_full * (jnp.log(jnp.maximum(true_full, 1e-20)) - log_probs), axis=-1)
    kl = jnp.where(valid, kl, 0.0)
    denom = jnp.sum(valid) if normalize_length else bsz
    return jnp.sum(kl) / jnp.maximum(denom, 1)


def attention_loss(
    p: Params,
    memory: jax.Array,
    memory_pad_mask: jax.Array,
    labels: jax.Array,
    label_lengths: jax.Array,
    cfg: ModelConfig,
    *,
    rng: jax.Array | None = None,
    deterministic: bool = True,
) -> jax.Array:
    """Joint L2R (+ weighted R2L) attention loss (the reference's intended
    but dead path, model.py:85)."""
    ys_in, ys_out = masks.add_sos_eos(
        labels, label_lengths, cfg.sos_eos_id, cfg.sos_eos_id, cfg.ignore_id
    )
    lens_in = label_lengths + 1
    logits = transformer_decoder_forward(
        p["left_decoder"], memory, memory_pad_mask, ys_in, lens_in, cfg,
        rng=rng, deterministic=deterministic,
    )
    loss = label_smoothing_loss(logits, ys_out, cfg.lsm_weight, cfg.ignore_id)
    if cfg.reverse_weight > 0 and "right_decoder" in p:
        r_labels = masks.reverse_sequence(labels, label_lengths, cfg.ignore_id)
        r_in, r_out = masks.add_sos_eos(
            r_labels, label_lengths, cfg.sos_eos_id, cfg.sos_eos_id, cfg.ignore_id
        )
        r_logits = transformer_decoder_forward(
            p["right_decoder"], memory, memory_pad_mask, r_in, lens_in, cfg,
            rng=rng, deterministic=deterministic,
        )
        r_loss = label_smoothing_loss(
            r_logits, r_out, cfg.lsm_weight, cfg.ignore_id
        )
        loss = (1 - cfg.reverse_weight) * loss + cfg.reverse_weight * r_loss
    return loss
