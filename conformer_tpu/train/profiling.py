"""Tracing / profiling utilities (SURVEY.md §5.1 — the reference has none).

- `trace(logdir)`: context manager around jax.profiler (TensorBoard-viewable
  traces of XLA execution on the chip).
- `StepTimer`: wall-clock per-step timing with warmup skip and
  audio-seconds/s accounting (the framework's north-star metric).
- `device_sync(x)`: force completion by fetching a scalar — REQUIRED on this
  image's relay backend where block_until_ready does not synchronize.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


def device_sync(x) -> float:
    """Force device completion; returns the fetched scalar."""
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.sum(leaf)) if leaf.ndim else float(leaf)


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace (view with TensorBoard's profile plugin)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates per-step wall time + audio seconds processed."""

    def __init__(self, warmup_steps: int = 1):
        self.warmup = warmup_steps
        self.steps = 0
        self.total_time = 0.0
        self.total_audio_seconds = 0.0
        self._t0: float | None = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, audio_seconds: float = 0.0) -> float:
        assert self._t0 is not None, "start() not called"
        dt = time.perf_counter() - self._t0
        self._t0 = None
        self.steps += 1
        if self.steps > self.warmup:
            self.total_time += dt
            self.total_audio_seconds += audio_seconds
        return dt

    @property
    def steps_per_sec(self) -> float:
        counted = max(self.steps - self.warmup, 0)
        return counted / self.total_time if self.total_time else 0.0

    @property
    def audio_seconds_per_sec(self) -> float:
        return (
            self.total_audio_seconds / self.total_time if self.total_time else 0.0
        )

    def summary(self) -> dict:
        return {
            "steps": self.steps,
            "steps_per_sec": round(self.steps_per_sec, 4),
            "audio_seconds_per_sec": round(self.audio_seconds_per_sec, 2),
        }
