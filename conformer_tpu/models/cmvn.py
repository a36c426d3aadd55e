"""Global CMVN: (x - mean) * istd with stats from the Kaldi-style JSON file.

Reference: /root/reference/src/cmvn.py:5-33 and the loader
/root/reference/src/utils.py:7-28 (variance floor 1e-20).
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np


def load_cmvn_stats(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Load {mean_stat, var_stat, frame_num} JSON -> (mean, istd) fp32."""
    with open(path) as f:
        stats = json.load(f)
    mean_stat = np.asarray(stats["mean_stat"], np.float64)
    var_stat = np.asarray(stats["var_stat"], np.float64)
    count = float(stats["frame_num"])
    mean = mean_stat / count
    var = var_stat / count - mean * mean
    var = np.maximum(var, 1.0e-20)
    istd = 1.0 / np.sqrt(var)
    return mean.astype(np.float32), istd.astype(np.float32)


def init_cmvn_from_file(path: str) -> dict:
    mean, istd = load_cmvn_stats(path)
    return {"mean": jnp.asarray(mean), "istd": jnp.asarray(istd)}


def init_cmvn_identity(dim: int) -> dict:
    return {"mean": jnp.zeros((dim,), jnp.float32), "istd": jnp.ones((dim,), jnp.float32)}


def global_cmvn(p: dict, x: jax.Array, norm_var: bool = True) -> jax.Array:
    y = x - p["mean"].astype(x.dtype)
    if norm_var:
        y = y * p["istd"].astype(x.dtype)
    return y
