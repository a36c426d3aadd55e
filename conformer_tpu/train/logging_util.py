"""Metric logging: stdout + JSONL file + optional Weights & Biases.

Replaces the reference's WandbLogger (src/executor.py:144) with a
dependency-free JSONL stream (one {step, **metrics} object per line) that
W&B-style dashboards can tail; wandb itself is used when importable.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any


class MetricLogger:
    def __init__(self, log_dir: str, project: str = "conformer-rnnt", use_wandb: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._t0 = time.time()
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project=project, dir=log_dir)
            except Exception:
                self._wandb = None

    def log(self, step: int, metrics: dict[str, Any], prefix: str = "") -> None:
        rec = {"step": step, "time": round(time.time() - self._t0, 3)}
        rec.update({prefix + k: _to_py(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        pretty = " ".join(
            f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}"
            for k, v in rec.items()
            if k != "time"
        )
        print(f"[{rec['time']:9.1f}s] {pretty}", file=sys.stderr)
        if self._wandb is not None:
            self._wandb.log({prefix + k: _to_py(v) for k, v in metrics.items()}, step=step)

    def close(self) -> None:
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()


def _to_py(v: Any):
    try:
        return float(v)
    except Exception:
        return v
