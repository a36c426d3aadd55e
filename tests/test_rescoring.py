"""Attention rescoring decode smoke."""

import dataclasses

import jax
import jax.numpy as jnp

from conformer_tpu.config import tiny_test_config
from conformer_tpu.decode.rescoring import attention_rescoring
from conformer_tpu.models.transducer import init_transducer

import pytest


def test_attention_rescoring_runs():
    cfg = dataclasses.replace(
        tiny_test_config().model, decoder_num_layers=1, attention_weight=0.3
    )
    p = init_transducer(jax.random.PRNGKey(0), cfg)
    enc = jax.random.normal(jax.random.PRNGKey(1), (2, 8, cfg.encoder_dim))
    out = attention_rescoring(
        p, enc, jnp.array([8, 6]), cfg, beam_size=4, ctc_weight=0.5
    )
    assert len(out) == 2
    assert all(isinstance(h, list) for h in out)


def test_attention_rescoring_requires_decoder():
    cfg = tiny_test_config().model
    p = init_transducer(jax.random.PRNGKey(0), cfg)
    enc = jax.random.normal(jax.random.PRNGKey(1), (1, 4, cfg.encoder_dim))
    with pytest.raises(ValueError):
        attention_rescoring(p, enc, jnp.array([4]), cfg)
