"""Numerical ops: pure-JAX reference implementations + Pallas TPU kernels.

Every op ships a pure-JAX implementation first (correct, jit-able,
CPU-testable), then a Pallas kernel validated against it (SURVEY.md §7
layer 1). The native-dependency equivalences vs the reference are catalogued
in SURVEY.md §2.3 (torchaudio rnnt_loss -> ops.rnnt, nn.CTCLoss -> ops.ctc,
kaldi fbank -> ops.fbank).
"""
