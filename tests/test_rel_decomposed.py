"""Decomposed (angle-addition) relative bias == legacy skew path, exactly."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from conformer_tpu.config import tiny_test_config
from conformer_tpu.models import attention, embedding, encoder as enc_mod, layers


def test_rel_bias_decomposed_matches_skew():
    d_model, h = 64, 4
    dk = d_model // h
    p = attention.init_mhsa(jax.random.PRNGKey(0), d_model, h, relative=True)
    tq, tk = 9, 14  # cache of 5
    q_v = jax.random.normal(jax.random.PRNGKey(1), (2, h, tq, dk))

    # skew path
    table = embedding.signed_sinusoid_table(64, d_model)
    pos_emb = embedding.relative_pos_embed(table, tq, tk)
    p_proj = layers.dense(p["linear_pos"], pos_emb)
    p_proj = p_proj.reshape(-1, h, dk)
    bd_full = jnp.einsum(
        "bhid,phd->bhip", q_v, p_proj, preferred_element_type=jnp.float32
    )
    bd_skew = attention._rel_skew(bd_full, tk)

    # decomposed path: q_pos = cache + i, k_pos = j
    cache = tk - tq
    bd_dec = attention.rel_bias_decomposed(
        p, q_v, cache + jnp.arange(tq), jnp.arange(tk), h
    )
    np.testing.assert_allclose(
        np.asarray(bd_dec), np.asarray(bd_skew), rtol=1e-4, atol=1e-4
    )


def test_encoder_forward_same_under_both_rel_modes():
    base = tiny_test_config().model
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 80, base.input_dim))
    lens = jnp.array([80, 64])
    cfg_skew = dataclasses.replace(base, rel_mode="skew")
    cfg_dec = dataclasses.replace(base, rel_mode="decomposed")
    p = enc_mod.init_encoder(jax.random.PRNGKey(0), cfg_skew)
    out_skew, _ = enc_mod.encoder_forward(p, feats, lens, cfg_skew, deterministic=True)
    out_dec, _ = enc_mod.encoder_forward(p, feats, lens, cfg_dec, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out_dec), np.asarray(out_skew), rtol=2e-4, atol=2e-4
    )


def test_streaming_chunk_same_under_both_rel_modes():
    base = tiny_test_config().model
    cfg_skew = dataclasses.replace(base, rel_mode="skew", causal_conv=True)
    cfg_dec = dataclasses.replace(base, rel_mode="decomposed", causal_conv=True)
    p = enc_mod.init_encoder(jax.random.PRNGKey(0), cfg_skew)
    chunk_feats = jax.random.normal(jax.random.PRNGKey(2), (1, 23, base.input_dim))
    st1 = enc_mod.init_encoder_state(cfg_skew, 1, cache_size=8)
    st2 = enc_mod.init_encoder_state(cfg_dec, 1, cache_size=8)
    y1, st1 = enc_mod.encoder_forward_chunk(p, chunk_feats, st1, cfg_skew)
    y2, st2 = enc_mod.encoder_forward_chunk(p, chunk_feats, st2, cfg_dec)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), rtol=2e-4, atol=2e-4)
    # second chunk exercises valid-cache masking + position consistency
    y1b, _ = enc_mod.encoder_forward_chunk(p, chunk_feats, st1, cfg_skew)
    y2b, _ = enc_mod.encoder_forward_chunk(p, chunk_feats, st2, cfg_dec)
    np.testing.assert_allclose(np.asarray(y2b), np.asarray(y1b), rtol=2e-4, atol=2e-4)
