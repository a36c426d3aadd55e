"""conformer_tpu — TPU-native (JAX/XLA/Pallas/pjit) Conformer ASR framework.

A from-scratch rebuild of the capabilities of the reference
`conformer-pytorch-lightning` project (see SURVEY.md), designed TPU-first:

- pure-function models over explicit parameter pytrees (no framework magic),
- static shapes + `lax.scan`/`lax.while_loop` control flow so everything jits,
- Pallas kernels for the hot ops (RNN-T/CTC lattice losses, fbank frontend),
- GSPMD `jax.sharding.Mesh` parallelism ("data", "model") scaling from one
  chip to multi-host pod slices,
- a host-side streaming data pipeline with length-bucketed static batching.

Layout:
    ops/        numerical kernels: pure-JAX reference impls + Pallas TPU kernels
    models/     Conformer encoder, LSTM predictor, additive joint, CTC head
    data/       host-side pipeline (wav -> tokens -> fbank -> SpecAug -> buckets)
    parallel/   mesh + sharding specs
    train/      pjit train loop, optimizer, checkpointing, metrics
    decode/     batched greedy / beam RNN-T + CTC decoding, streaming scan
    serve/      REST + WebSocket serving with per-session immutable state
    tools/      offline data tooling (LibriSpeech collection, CMVN, vocab)
"""

__version__ = "0.1.0"
