"""Fused rel-pos flash-attention kernel vs the XLA path (interpret mode)."""

import dataclasses
import functools
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np

from conformer_tpu.config import tiny_test_config
from conformer_tpu.models import attention, masks
from conformer_tpu.ops.pallas import attention_kernel as ak


def _setup(b=2, h=4, t=40, tk=40, dk=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    d = h * dk
    p = attention.init_mhsa(ks[0], d, h, relative=True)
    q_u = jax.random.normal(ks[1], (b, h, t, dk))
    ab_src_qv = jax.random.normal(ks[2], (b, h, t, dk))
    k = jax.random.normal(ks[3], (b, h, tk, dk))
    v = jax.random.normal(ks[4], (b, h, tk, dk))
    return p, q_u, ab_src_qv, k, v


def test_kernel_matches_xla_reference():
    p, q_u, q_v, k, v = _setup()
    b, h, t, dk = q_u.shape
    tk = k.shape[2]
    scale = 1.0 / np.sqrt(dk)
    q_pos = jnp.arange(t)
    k_pos = jnp.arange(tk)
    lengths = jnp.array([tk, tk - 7])
    mask = masks.make_non_pad_mask(lengths, tk)[:, None, :].repeat(t, axis=1)

    # XLA reference: ac + decomposed bd, masked softmax, AV
    ac = jnp.einsum("bhid,bhjd->bhij", q_u, k, preferred_element_type=jnp.float32)
    bd = attention.rel_bias_decomposed(p, q_v, q_pos, k_pos, h)
    scores = (ac + bd) * scale
    attn = attention._masked_softmax(scores, mask[:, None])
    ref = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)

    ab, k_feats = attention.rel_features(p, q_v, q_pos, k_pos, h)
    got = ak.rel_flash_attention(
        q_u, ab, k, v, k_feats, mask, scale=scale,
        tile_q=16, tile_k=16, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_kernel_handles_nondivisible_and_fully_masked_rows():
    p, q_u, q_v, k, v = _setup(t=23, tk=29)
    b, h, t, dk = q_u.shape
    tk = k.shape[2]
    scale = 1.0 / np.sqrt(dk)
    # row padding: some query rows attend to nothing
    mask = jnp.ones((b, t, tk), bool).at[:, -3:, :].set(False)
    ab, k_feats = attention.rel_features(
        p, q_v, jnp.arange(t), jnp.arange(tk), h
    )
    got = ak.rel_flash_attention(
        q_u, ab, k, v, k_feats, mask, scale=scale,
        tile_q=16, tile_k=16, interpret=True,
    )
    out = np.asarray(got)
    assert out.shape == (b, h, t, dk)
    np.testing.assert_array_equal(out[:, :, -3:, :], 0.0)
    assert np.isfinite(out).all()


def test_mhsa_pallas_path_matches_xla_path():
    cfg = dataclasses.replace(
        tiny_test_config().model, rel_mode="decomposed"
    )
    d, h = cfg.encoder_dim, cfg.num_heads
    p = attention.init_mhsa(jax.random.PRNGKey(0), d, h, relative=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 24, d))
    lengths = jnp.array([24, 17])
    mask = masks.make_non_pad_mask(lengths, 24)[:, None, :].repeat(24, axis=1)
    rel_positions = (jnp.arange(24), jnp.arange(24))

    ref, _ = attention.mhsa(
        p, x, x, mask, num_heads=h, rel_positions=rel_positions,
    )
    # interpret=True so the kernel path runs on CPU
    with mock.patch.object(
        ak, "rel_flash_attention",
        functools.partial(ak.rel_flash_attention.__wrapped__, tile_q=8,
                          tile_k=8, interpret=True),
    ):
        got, _ = attention.mhsa(
            p, x, x, mask, num_heads=h, rel_positions=rel_positions,
            use_pallas=True,
        )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )
