"""Training runtime: optimizer, pjit train step, checkpoints, metrics."""
