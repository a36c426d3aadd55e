"""Pallas TPU kernels, each validated against the pure-JAX ops/ impls."""
