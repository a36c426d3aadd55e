"""Streaming-equivalence: chunked cached execution vs full-context forward.

The property the reference's cache design is supposed to guarantee
(SURVEY.md §4c): with causal conv + static chunk masks + unlimited left
context, running the encoder chunk-by-chunk with caches must reproduce the
full-context forward exactly (the reference itself VIOLATES this via its
empty cnn_cache; our real conv cache fixes it).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from conformer_tpu.config import tiny_test_config
from conformer_tpu.models import encoder as enc_mod


def _cfg(**kw):
    base = tiny_test_config().model
    return dataclasses.replace(
        base,
        causal_conv=True,
        use_dynamic_chunk=False,
        use_dynamic_left_chunk=False,
        **kw,
    )


def test_chunked_matches_full_context_causal():
    chunk = 4
    cfg = _cfg(static_chunk_size=chunk)
    p = enc_mod.init_encoder(jax.random.PRNGKey(0), cfg)
    stride, window, context = enc_mod.chunk_window_params(chunk)
    n_chunks = 3
    t_raw = (n_chunks - 1) * stride + window   # exactly 3 chunks of 4
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, t_raw, cfg.input_dim))
    lens = jnp.array([t_raw, t_raw])

    full, _ = enc_mod.encoder_forward(
        p, feats, lens, cfg, deterministic=True,
        decoding_chunk_size=chunk, num_decoding_left_chunks=-1,
    )

    # chunk-by-chunk with big cache (unlimited left context)
    state = enc_mod.init_encoder_state(cfg, 2, cache_size=chunk * n_chunks)
    outs = []
    for i in range(n_chunks):
        cfeats = feats[:, i * stride : i * stride + window, :]
        y, state = enc_mod.encoder_forward_chunk(p, cfeats, state, cfg)
        outs.append(np.asarray(y))
    chunked = np.concatenate(outs, axis=1)

    assert chunked.shape == full.shape
    np.testing.assert_allclose(chunked, np.asarray(full), rtol=2e-4, atol=2e-5)


def test_forward_chunk_by_chunk_wrapper():
    chunk = 4
    cfg = _cfg(static_chunk_size=chunk)
    p = enc_mod.init_encoder(jax.random.PRNGKey(0), cfg)
    stride, window, _ = enc_mod.chunk_window_params(chunk)
    t_raw = stride + window
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, t_raw, cfg.input_dim))
    out, mask = enc_mod.encoder_forward_chunk_by_chunk(
        p, feats, cfg, decoding_chunk_size=chunk, num_decoding_left_chunks=-1
    )
    assert out.shape[1] == 2 * chunk
    assert mask.all()


def test_limited_left_context_cache_trimming():
    """With num_left_chunks=1 the cache holds exactly one chunk; outputs must
    match the full forward under the corresponding mask."""
    chunk = 4
    cfg = _cfg(static_chunk_size=chunk)
    p = enc_mod.init_encoder(jax.random.PRNGKey(0), cfg)
    stride, window, _ = enc_mod.chunk_window_params(chunk)
    n_chunks = 3
    t_raw = (n_chunks - 1) * stride + window
    feats = jax.random.normal(jax.random.PRNGKey(2), (1, t_raw, cfg.input_dim))

    state = enc_mod.init_encoder_state(cfg, 1, cache_size=chunk * 1)
    outs = []
    for i in range(n_chunks):
        cfeats = feats[:, i * stride : i * stride + window, :]
        y, state = enc_mod.encoder_forward_chunk(p, cfeats, state, cfg)
        outs.append(np.asarray(y))
    chunked = np.concatenate(outs, axis=1)
    assert np.isfinite(chunked).all()
    assert int(state.attn_len[0]) == chunk
    assert int(state.offset[0]) == n_chunks * chunk
