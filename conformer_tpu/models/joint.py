"""Additive RNN-T joint network (reference: src/joint.py:4-38).

joint(h_enc, g_pred) = W_out tanh(W_enc h + W_pred g), broadcast over
[B, T, U, join_dim]. The full [B, T, U, V] logits tensor is the training
memory hotspot (SURVEY.md §3.1); ops/rnnt.py provides a fused loss path that
never materializes V for the whole lattice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from . import layers
from .layers import Params


def init_joint(rng, cfg: ModelConfig) -> Params:
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "enc_ffn": layers.init_dense(k1, cfg.encoder_dim, cfg.join_dim),
        "pred_ffn": layers.init_dense(k2, cfg.predictor_dim, cfg.join_dim),
        "ffn_out": layers.init_dense(k3, cfg.join_dim, cfg.vocab_size),
    }


def joint_project(p: Params, enc_out: jax.Array, pred_out: jax.Array):
    """Pre-project encoder/predictor outputs to join_dim (pre_project=True)."""
    return layers.dense(p["enc_ffn"], enc_out), layers.dense(p["pred_ffn"], pred_out)


def joint_lattice(
    p: Params, enc_out: jax.Array, pred_out: jax.Array, pre_project: bool = True
) -> jax.Array:
    """Full lattice logits: enc [B,T,D], pred [B,U,P] -> [B,T,U,V]."""
    if pre_project:
        enc_out, pred_out = joint_project(p, enc_out, pred_out)
    x = enc_out[:, :, None, :] + pred_out[:, None, :, :]
    return layers.dense(p["ffn_out"], jnp.tanh(x))


def joint_step(
    p: Params, enc_frame: jax.Array, pred_frame: jax.Array, pre_project: bool = True
) -> jax.Array:
    """Pointwise joint for decoding: enc [B, D], pred [B, P] -> [B, V]."""
    if pre_project:
        enc_frame = layers.dense(p["enc_ffn"], enc_frame)
        pred_frame = layers.dense(p["pred_ffn"], pred_frame)
    return layers.dense(p["ffn_out"], jnp.tanh(enc_frame + pred_frame))
