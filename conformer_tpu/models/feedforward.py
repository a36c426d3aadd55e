"""Position-wise feed-forward module (reference: src/feedforward.py:4-22)."""

from __future__ import annotations

import jax

from . import layers
from .layers import Params


def init_ffn(rng, dim: int, hidden_dim: int) -> Params:
    k1, k2 = jax.random.split(rng)
    return {
        "w_1": layers.init_dense(k1, dim, hidden_dim),
        "w_2": layers.init_dense(k2, hidden_dim, dim),
    }


def ffn(
    p: Params,
    x: jax.Array,
    *,
    activation: str = "swish",
    dropout_rate: float = 0.0,
    rng: jax.Array | None = None,
    deterministic: bool = True,
) -> jax.Array:
    y = layers.dense(p["w_1"], x)
    y = layers.swish(y) if activation == "swish" else jax.nn.relu(y)
    y = layers.dropout(rng, y, dropout_rate, deterministic)
    return layers.dense(p["w_2"], y)
