"""Transducer model: encoder + predictor + joint + CTC head, joint loss.

Rebuilds /root/reference/src/model.py (Transducer.forward :71-93, rnnt_loss
:95-113, ctc_loss :115-124) as a pure function of (params, batch, rng).
Decoding entry points live in decode/ (greedy.py, streaming.py) — they take
the same params pytree.

loss = ctc_weight * ctc + transducer_weight * rnnt   (model.py:86)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.rnnt import rnnt_loss_fused
from . import ctc_head, decoder as decoder_mod, encoder, joint, masks, predictor
from .layers import Params


def init_transducer(rng, cfg: ModelConfig, cmvn: Params | None = None) -> Params:
    k_enc, k_pred, k_joint, k_ctc, k_dec = jax.random.split(rng, 5)
    p: Params = {
        "encoder": encoder.init_encoder(k_enc, cfg),
        "predictor": predictor.init_predictor(k_pred, cfg),
        "joint": joint.init_joint(k_joint, cfg),
        "ctc": ctc_head.init_ctc_head(k_ctc, cfg),
    }
    if cfg.decoder_num_layers > 0:
        r_layers = cfg.decoder_num_layers if cfg.reverse_weight > 0 else 0
        p["decoder"] = decoder_mod.init_bi_decoder(k_dec, cfg, r_layers)
    if cfg.use_pruned_loss:
        from . import layers as layers_mod

        k_am, k_lm = jax.random.split(jax.random.fold_in(rng, 7))
        p["simple_am_proj"] = layers_mod.init_dense(
            k_am, cfg.encoder_dim, cfg.vocab_size
        )
        p["simple_lm_proj"] = layers_mod.init_dense(
            k_lm, cfg.predictor_dim, cfg.vocab_size
        )
    if cmvn is not None:
        p["cmvn"] = cmvn
    return p


def transducer_forward(
    p: Params,
    feats: jax.Array,
    feat_lengths: jax.Array,
    labels: jax.Array,
    label_lengths: jax.Array,
    cfg: ModelConfig,
    *,
    rng: jax.Array | None = None,
    deterministic: bool = False,
    encoder_fn=None,
) -> dict[str, Any]:
    """Training forward: returns the loss dict of reference model.py:88-93.

    Args:
        feats: [B, T, F]; feat_lengths: [B];
        labels: [B, U] int32 (padded with 0 or ignore_id); label_lengths: [B].
        encoder_fn: optional replacement for encoder.encoder_forward with the
            same (p, feats, lens, cfg, *, cmvn, rng, deterministic) signature
            — e.g. parallel.pipeline.encoder_forward_pipelined bound to a
            ("data", "pipe") mesh for pipeline-parallel training.
    """
    if rng is not None:
        r_enc, r_pred, r_ctc, r_dec = jax.random.split(rng, 4)
    else:
        r_enc = r_pred = r_ctc = r_dec = None

    enc_fwd = encoder_fn if encoder_fn is not None else encoder.encoder_forward
    encoder_out, encoder_mask = enc_fwd(
        p["encoder"], feats, feat_lengths, cfg,
        cmvn=p.get("cmvn"), rng=r_enc, deterministic=deterministic,
    )
    encoder_out_lens = jnp.sum(encoder_mask.astype(jnp.int32), axis=1)

    # RNN-T branch (model.py:95-113): predictor consumes [blank, labels].
    labels_in = masks.add_blank(labels, cfg.blank_id, cfg.ignore_id)
    pred_out = predictor.predictor_forward(
        p["predictor"], labels_in, cfg, rng=r_pred, deterministic=deterministic
    )
    enc_proj, pred_proj = joint.joint_project(p["joint"], encoder_out, pred_out)
    rnnt_text = jnp.where(labels == cfg.ignore_id, cfg.blank_id, labels).astype(
        jnp.int32
    )
    # Rows with feat_length == 0 are bucket-padding dummies (data/processor.py
    # pads incomplete bucket batches to a static batch size); mask them out.
    row_valid = feat_lengths > 0
    n_valid = jnp.maximum(jnp.sum(row_valid.astype(jnp.float32)), 1.0)
    t_lens = jnp.maximum(encoder_out_lens, 1).astype(jnp.int32)
    u_lens = label_lengths.astype(jnp.int32)

    def masked_mean(nll):
        return jnp.sum(jnp.where(row_valid, nll, 0.0)) / n_valid

    aux: dict[str, Any] = {}
    if cfg.use_pruned_loss:
        from ..ops.rnnt_pruned import rnnt_loss_pruned_full
        from . import layers as layers_mod

        am = layers_mod.dense(p["simple_am_proj"], encoder_out)
        lm = layers_mod.dense(p["simple_lm_proj"], pred_out)
        simple_nll, pruned_nll = rnnt_loss_pruned_full(
            am, lm, enc_proj, pred_proj,
            p["joint"]["ffn_out"]["kernel"], p["joint"]["ffn_out"]["bias"],
            rnnt_text, t_lens, u_lens,
            s_range=cfg.prune_range, blank=cfg.blank_id,
            lattice_impl="pallas" if cfg.use_pallas_rnnt else "xla",
            # fused online-logsumexp simple pass (the r3 pruned path's real
            # bottleneck, ops/pallas/simple_lattice_kernel.py)
            simple_impl="pallas" if cfg.use_pallas_rnnt else "xla",
            t_chunk=cfg.rnnt_t_chunk,
        )
        loss_simple = masked_mean(simple_nll)
        loss_rnnt = masked_mean(pruned_nll) + cfg.simple_loss_scale * loss_simple
        aux["loss_simple"] = loss_simple
    else:
        nll_rnnt = rnnt_loss_fused(
            enc_proj,
            pred_proj,
            p["joint"]["ffn_out"]["kernel"],
            p["joint"]["ffn_out"]["bias"],
            rnnt_text,
            t_lens,
            u_lens,
            blank=cfg.blank_id,
            reduction="none",
            lattice_impl="pallas" if cfg.use_pallas_rnnt else "xla",
            joint_impl="pallas" if cfg.use_pallas_joint else "xla",
            t_chunk=cfg.rnnt_t_chunk,
        )
        loss_rnnt = masked_mean(nll_rnnt)

    loss_ctc = ctc_head.ctc_head_loss(
        p["ctc"], encoder_out, jnp.maximum(encoder_out_lens, 1), rnnt_text,
        label_lengths, cfg,
        rng=r_ctc, deterministic=deterministic, row_valid=row_valid,
    )

    loss = cfg.ctc_weight * loss_ctc + cfg.transducer_weight * loss_rnnt
    out: dict[str, Any] = {
        "loss_ctc": loss_ctc,
        "loss_rnnt": loss_rnnt,
        "encoder_out": encoder_out,
        "encoder_out_lens": encoder_out_lens,
        **aux,
    }
    # Optional attention-decoder loss (the reference's intended-but-dead
    # third branch, model.py:85; working here).
    if cfg.attention_weight > 0 and "decoder" in p:
        loss_attn = decoder_mod.attention_loss(
            p["decoder"], encoder_out, encoder_mask, rnnt_text, label_lengths,
            cfg, rng=r_dec, deterministic=deterministic,
        )
        loss = loss + cfg.attention_weight * loss_attn
        out["loss_attn"] = loss_attn
    out["loss"] = loss
    return out


def encode(
    p: Params,
    feats: jax.Array,
    feat_lengths: jax.Array,
    cfg: ModelConfig,
    *,
    decoding_chunk_size: int = 0,
    num_decoding_left_chunks: int = -1,
) -> tuple[jax.Array, jax.Array]:
    """Inference encoder pass (full context or static-chunk masked)."""
    out, mask = encoder.encoder_forward(
        p["encoder"], feats, feat_lengths, cfg,
        cmvn=p.get("cmvn"), deterministic=True,
        decoding_chunk_size=decoding_chunk_size,
        num_decoding_left_chunks=num_decoding_left_chunks,
    )
    return out, jnp.sum(mask.astype(jnp.int32), axis=1)
