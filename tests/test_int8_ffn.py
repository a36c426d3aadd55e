"""Fully-fused int8 FFN kernel (ops/pallas/ffn_kernel.py): interpret-mode
kernel vs the XLA oracle, and the encoder dispatch with fuse_ffn-quantized
parameters."""

import jax
import jax.numpy as jnp
import numpy as np

from conformer_tpu.ops.pallas.ffn_kernel import (
    int8_ffn_fused,
    int8_ffn_reference,
)
from conformer_tpu.ops.quant import quantize_dense_params, quantize_tree


def _make_ffn(rng, d=128, h=512):
    k1, k2, k3 = jax.random.split(rng, 3)
    w1 = {
        "kernel": jax.random.normal(k1, (d, h)) * 0.05,
        "bias": jax.random.normal(k2, (h,)) * 0.1,
    }
    w2 = {
        "kernel": jax.random.normal(k3, (h, d)) * 0.05,
        "bias": jnp.zeros((d,)),
    }
    ln = {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}
    return ln, quantize_dense_params(w1), quantize_dense_params(w2)


def test_fused_kernel_matches_oracle():
    ln, q1, q2 = _make_ffn(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 50, 128))
    args = (
        x, ln,
        q1["kernel_q"], q1["kernel_scale"], q1["bias"],
        q2["kernel_q"], q2["kernel_scale"], q2["bias"],
    )
    ref = int8_ffn_reference(*args, half=0.5)
    out = int8_ffn_fused(*args, half=0.5, tile_m=64, interpret=True)
    # atol: one int8 LSB can flip at round-boundary under different fp
    # contraction order; that moves the output by ~scale/127 ≈ 1e-3 here
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-2, atol=2e-3
    )


def test_fused_kernel_bf16_and_uneven_rows():
    ln, q1, q2 = _make_ffn(jax.random.PRNGKey(2))
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 37, 128), jnp.bfloat16)
    args = (
        x, ln,
        q1["kernel_q"], q1["kernel_scale"], q1["bias"],
        q2["kernel_q"], q2["kernel_scale"], q2["bias"],
    )
    ref = int8_ffn_reference(*args)
    out = int8_ffn_fused(*args, tile_m=32, interpret=True)
    assert out.dtype == jnp.bfloat16 and out.shape == x.shape
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_quantize_tree_fuse_ffn_quantizes_both_matmuls():
    from conformer_tpu.config import tiny_test_config
    from conformer_tpu.models.transducer import init_transducer

    cfg = tiny_test_config().model
    params = init_transducer(jax.random.PRNGKey(0), cfg)
    q = quantize_tree(params, skip_keys=("predictor", "cmvn", "joint", "ctc"),
                      fuse_ffn=True)
    ffn = q["encoder"]["layers"]["feed_forward"]
    assert "kernel_q" in ffn["w_1"] and "kernel_q" in ffn["w_2"]
    # default (unfused) keeps the contraction in float
    q0 = quantize_tree(params, skip_keys=("predictor", "cmvn", "joint", "ctc"))
    assert "kernel_q" not in q0["encoder"]["layers"]["feed_forward"]["w_2"]


def test_encoder_forward_with_fused_quant_params():
    """CPU dispatch takes the int8 oracle path; output must stay close to
    the float encoder (quantization noise only)."""
    from conformer_tpu.config import tiny_test_config
    from conformer_tpu.models.encoder import encoder_forward, init_encoder

    cfg = tiny_test_config().model
    params = init_encoder(jax.random.PRNGKey(0), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 96, cfg.input_dim))
    lens = jnp.array([96, 64], jnp.int32)
    ref, mask = jax.jit(lambda p: encoder_forward(p, feats, lens, cfg))(params)
    qparams = quantize_tree(params, min_dim=64, fuse_ffn=True)
    out, _ = jax.jit(lambda p: encoder_forward(p, feats, lens, cfg))(qparams)
    m = np.asarray(mask)[..., None]
    err = np.abs(np.asarray(out) - np.asarray(ref)) * m
    scale = np.abs(np.asarray(ref)).mean()
    assert err.max() < 0.35 * max(scale, 1.0), (err.max(), scale)
