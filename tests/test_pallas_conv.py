"""Fused conv-block kernel vs the modular XLA path (interpret mode)."""

import dataclasses
import functools
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np

from conformer_tpu.config import tiny_test_config
from conformer_tpu.models import convolution, layers, masks
from conformer_tpu.models.transducer import encode, init_transducer
from conformer_tpu.ops.pallas import conv_kernel as ck


def _ref_block(p_norm, p_conv, x, pad_mask, kernel_size):
    y = layers.layer_norm(p_norm, x)
    y, cache = convolution.conv_module(
        p_conv, y, pad_mask, kernel_size=kernel_size, norm_type="layer_norm",
    )
    return x + y, cache


def test_fused_conv_block_matches_xla():
    d, k, b, t = 64, 15, 3, 29
    rng = jax.random.split(jax.random.PRNGKey(0), 2)
    p_conv = convolution.init_conv_module(rng[0], d, k)
    p_norm = layers.init_layer_norm(d)
    p_norm["scale"] = p_norm["scale"] * 1.1 + 0.05
    x = jax.random.normal(rng[1], (b, t, d))
    lengths = jnp.array([29, 17, 1])
    pad_mask = masks.make_non_pad_mask(lengths, t)

    ref, ref_cache = _ref_block(p_norm, p_conv, x, pad_mask, k)
    got, got_cache = ck.conv_block_fused(
        x, lengths, p_norm, p_conv, kernel_size=k, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_cache), np.asarray(ref_cache),
                               rtol=1e-4, atol=1e-4)


def test_short_utterance_and_even_context():
    # T < kernel context exercises the zero-left-padded cache path
    d, k, b, t = 64, 15, 2, 9
    rng = jax.random.split(jax.random.PRNGKey(1), 2)
    p_conv = convolution.init_conv_module(rng[0], d, k)
    p_norm = layers.init_layer_norm(d)
    x = jax.random.normal(rng[1], (b, t, d))
    lengths = jnp.array([9, 6])
    pad_mask = masks.make_non_pad_mask(lengths, t)
    ref, ref_cache = _ref_block(p_norm, p_conv, x, pad_mask, k)
    got, got_cache = ck.conv_block_fused(
        x, lengths, p_norm, p_conv, kernel_size=k, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_cache), np.asarray(ref_cache),
                               rtol=1e-4, atol=1e-4)


def test_encoder_with_fused_conv_matches_xla():
    cfg = tiny_test_config().model
    p = init_transducer(jax.random.PRNGKey(0), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 64, cfg.input_dim))
    lens = jnp.array([64, 48])
    ref, _ = encode(p, feats, lens, cfg)
    cfg2 = dataclasses.replace(cfg, use_pallas_conv=True)
    with mock.patch.object(
        ck, "conv_block_fused",
        functools.partial(ck.conv_block_fused.__wrapped__, interpret=True),
    ):
        got, _ = encode(p, feats, lens, cfg2)
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32), np.asarray(ref, dtype=np.float32),
        rtol=2e-2, atol=2e-2,
    )
