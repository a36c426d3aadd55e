"""RNN-T prediction network: embedding -> multi-layer LSTM -> projection.

Rebuilds /root/reference/src/predictor.py (RNNPredictor :14-87) without cuDNN:
the recurrence is a `lax.scan` over time with a fused gate matmul per layer
(one [B, E+H] x [E+H, 4H] MXU matmul per step). Gate layout and initializer
match torch.nn.LSTM (i, f, g, o; U(-1/sqrt(H), 1/sqrt(H))) so reference /
WeNet checkpoints import directly.

Single-step `predictor_step` (decode hot path, reference forward_step :76-86)
shares the cell code and carries (h, c) as an explicit [L, B, H] pytree.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from . import layers
from .layers import Params


class PredictorState(NamedTuple):
    h: jax.Array  # [L, B, H]
    c: jax.Array  # [L, B, H]


def init_predictor(rng, cfg: ModelConfig) -> Params:
    k_embed, k_rnn, k_proj = jax.random.split(rng, 3)
    h = cfg.predictor_hidden_size
    bound = 1.0 / math.sqrt(h)
    layer_keys = jax.random.split(k_rnn, cfg.predictor_num_layers)

    def init_lstm_layer(k, in_dim):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        u = lambda kk, shape: jax.random.uniform(kk, shape, jnp.float32, -bound, bound)
        return {
            "w_ih": u(k1, (in_dim, 4 * h)),
            "w_hh": u(k2, (h, 4 * h)),
            "b_ih": u(k3, (4 * h,)),
            "b_hh": u(k4, (4 * h,)),
        }

    rnn = [
        init_lstm_layer(layer_keys[i], cfg.predictor_embed_size if i == 0 else h)
        for i in range(cfg.predictor_num_layers)
    ]
    return {
        "embed": layers.init_embedding(k_embed, cfg.vocab_size, cfg.predictor_embed_size),
        "rnn": rnn,
        "projection": layers.init_dense(k_proj, h, cfg.predictor_dim),
    }


def init_predictor_state(cfg: ModelConfig, batch: int, dtype=jnp.float32) -> PredictorState:
    shape = (cfg.predictor_num_layers, batch, cfg.predictor_hidden_size)
    return PredictorState(h=jnp.zeros(shape, dtype), c=jnp.zeros(shape, dtype))


def _lstm_cell(lp: Params, x: jax.Array, h: jax.Array, c: jax.Array):
    """One torch-layout LSTM cell step. x [B, I], h/c [B, H]."""
    gates = (
        jnp.dot(x, lp["w_ih"].astype(x.dtype), preferred_element_type=jnp.float32)
        + jnp.dot(h, lp["w_hh"].astype(h.dtype), preferred_element_type=jnp.float32)
        + (lp["b_ih"] + lp["b_hh"])
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c_new = f * c.astype(jnp.float32) + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new.astype(x.dtype), c_new.astype(x.dtype)


def predictor_forward(
    p: Params,
    tokens: jax.Array,
    cfg: ModelConfig,
    *,
    state: PredictorState | None = None,
    rng: jax.Array | None = None,
    deterministic: bool = True,
) -> jax.Array:
    """Full-sequence forward: tokens [B, U] -> [B, U, predictor_dim].

    Inter-layer dropout matches torch.nn.LSTM(dropout=...) (applied after
    every layer except the last, reference predictor.py:30-35).
    """
    x = layers.embedding(p["embed"], tokens)
    if rng is not None:
        rng, r_emb = jax.random.split(rng)
    else:
        r_emb = None
    x = layers.dropout(r_emb, x, cfg.predictor_embed_dropout, deterministic)

    if state is None:
        state = init_predictor_state(cfg, tokens.shape[0], x.dtype)

    xs = x.transpose(1, 0, 2)  # [U, B, E]
    for li, lp in enumerate(p["rnn"]):
        h0, c0 = state.h[li].astype(x.dtype), state.c[li].astype(x.dtype)

        def step(carry, xt, lp=lp):
            h, c = carry
            h, c = _lstm_cell(lp, xt, h, c)
            return (h, c), h

        (_, _), ys = jax.lax.scan(step, (h0, c0), xs)
        if li < len(p["rnn"]) - 1 and not deterministic and cfg.predictor_dropout > 0:
            rng, r = jax.random.split(rng)
            ys = layers.dropout(r, ys, cfg.predictor_dropout, deterministic)
        xs = ys
    out = xs.transpose(1, 0, 2)  # [B, U, H]
    return layers.dense(p["projection"], out)


def predictor_step(
    p: Params,
    token: jax.Array,
    state: PredictorState,
    cfg: ModelConfig,
    *,
    padding: jax.Array | None = None,
) -> tuple[jax.Array, PredictorState]:
    """Single-token step: token [B] -> ([B, predictor_dim], new state).

    `padding` [B] (1 = padded row): padded rows keep their previous (h, c)
    (reference ApplyPadding, predictor.py:5-11, :84-85).
    """
    x = layers.embedding(p["embed"], token)  # [B, E]
    hs, cs = [], []
    for li, lp in enumerate(p["rnn"]):
        h, c = _lstm_cell(lp, x, state.h[li].astype(x.dtype), state.c[li].astype(x.dtype))
        hs.append(h)
        cs.append(c)
        x = h
    new_h = jnp.stack(hs)
    new_c = jnp.stack(cs)
    if padding is not None:
        keep = (padding == 0)[None, :, None]
        new_h = jnp.where(keep, new_h, state.h.astype(new_h.dtype))
        new_c = jnp.where(keep, new_c, state.c.astype(new_c.dtype))
    out = layers.dense(p["projection"], x)
    return out, PredictorState(h=new_h, c=new_c)
