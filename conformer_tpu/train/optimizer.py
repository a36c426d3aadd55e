"""Optimizer: Adam + WarmupLR + global-norm clip via optax.

Reference semantics (src/scheduler.py:36-49, src/module.py:140-143,
src/executor.py:150-151):
    lr(step) = base_lr * warmup^0.5 * min(step^-0.5, step * warmup^-1.5)
stepped per OPTIMIZER step (1-indexed), Adam defaults, clip 4, accumulation
handled by the loop (train/loop.py averages grads over accum_grad
microbatches before one optimizer step).

Non-trainable leaves (the sinusoid pos_table, batch-norm running stats) are
frozen with optax.masked.
"""

from __future__ import annotations

from typing import Any

import jax
import optax

from ..config import TrainConfig

_FROZEN_KEYS = ("pos_table",)
_FROZEN_SUFFIXES = ("norm.mean", "norm.var")


def warmup_lr_schedule(base_lr: float, warmup_steps: int):
    def schedule(step):
        s = step + 1  # reference scheduler is 1-indexed (last_epoch + 1)
        s = s.astype(jax.numpy.float32) if hasattr(s, "astype") else float(s)
        if warmup_steps == 0:
            return base_lr * s**-0.5
        return (
            base_lr
            * warmup_steps**0.5
            * jax.numpy.minimum(s**-0.5, s * warmup_steps**-1.5)
        )

    return schedule


def trainable_mask(params: Any) -> Any:
    """True for trainable leaves; False for pos tables / BN stats."""

    def path_str(path):
        return ".".join(str(getattr(k, "key", getattr(k, "idx", ""))) for k in path)

    return jax.tree_util.tree_map_with_path(
        lambda path, _: not (
            any(k in path_str(path) for k in _FROZEN_KEYS)
            or any(path_str(path).endswith(s) for s in _FROZEN_SUFFIXES)
        ),
        params,
    )


def make_optimizer(cfg: TrainConfig, params: Any) -> optax.GradientTransformation:
    schedule = warmup_lr_schedule(cfg.lr, cfg.warmup_steps)
    chain = [optax.clip_by_global_norm(cfg.grad_clip)]
    if cfg.weight_decay > 0:
        chain.append(
            optax.adamw(
                schedule,
                b1=cfg.adam_b1,
                b2=cfg.adam_b2,
                eps=cfg.adam_eps,
                weight_decay=cfg.weight_decay,
            )
        )
    else:
        chain.append(
            optax.adam(schedule, b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps)
        )
    tx = optax.chain(*chain)
    mask = trainable_mask(params)
    return optax.masked(tx, mask), schedule
