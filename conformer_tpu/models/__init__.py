"""Model components (pure functions + explicit parameter pytrees)."""

from . import (  # noqa: F401
    attention,
    cmvn,
    convolution,
    ctc_head,
    embedding,
    encoder,
    feedforward,
    joint,
    layers,
    masks,
    predictor,
    transducer,
)
