"""Attention decoder head + label smoothing loss (the reference's dead
branch, working here)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import torch

from conformer_tpu.config import tiny_test_config
from conformer_tpu.models import decoder as dec
from conformer_tpu.models.transducer import init_transducer, transducer_forward


def _cfg(**kw):
    return dataclasses.replace(
        tiny_test_config().model,
        decoder_num_layers=2,
        attention_weight=0.3,
        lsm_weight=0.1,
        **kw,
    )


def test_label_smoothing_matches_torch_kldiv():
    rng = np.random.default_rng(0)
    b, u, v = 2, 5, 11
    logits = rng.normal(size=(b, u, v)).astype(np.float32)
    targets = rng.integers(0, v, size=(b, u)).astype(np.int32)
    targets[1, 3:] = -1  # padding

    ours = float(
        dec.label_smoothing_loss(
            jnp.asarray(logits), jnp.asarray(targets), smoothing=0.1
        )
    )

    # torch oracle (reference label_smoothing_loss.py semantics)
    x = torch.tensor(logits).view(-1, v)
    t = torch.tensor(targets.astype(np.int64)).view(-1)
    conf = 0.9
    true_dist = torch.full((b * u, v), 0.1 / (v - 1))
    ignore = t == -1
    t2 = t.masked_fill(ignore, 0)
    true_dist.scatter_(1, t2.unsqueeze(1), conf)
    kl = torch.nn.KLDivLoss(reduction="none")(
        torch.log_softmax(x, dim=1), true_dist
    )
    expect = kl.masked_fill(ignore.unsqueeze(1), 0).sum() / b
    np.testing.assert_allclose(ours, float(expect), rtol=1e-4)


def test_decoder_forward_shapes_and_causality():
    cfg = _cfg()
    p = dec.init_transformer_decoder(jax.random.PRNGKey(0), cfg, 2)
    b, t, u = 2, 9, 6
    mem = jax.random.normal(jax.random.PRNGKey(1), (b, t, cfg.encoder_dim))
    mem_mask = jnp.ones((b, t), bool)
    ys = jax.random.randint(jax.random.PRNGKey(2), (b, u), 1, cfg.vocab_size)
    lens = jnp.array([u, u - 2])
    logits = dec.transformer_decoder_forward(p, mem, mem_mask, ys, lens, cfg)
    assert logits.shape == (b, u, cfg.vocab_size)

    # causality: changing a future target must not affect earlier logits
    ys2 = ys.at[:, -1].set((ys[:, -1] + 1) % cfg.vocab_size)
    logits2 = dec.transformer_decoder_forward(p, mem, mem_mask, ys2, lens, cfg)
    np.testing.assert_allclose(
        np.asarray(logits[:, :-1]), np.asarray(logits2[:, :-1]), atol=1e-5
    )


def test_transducer_with_attention_branch():
    cfg = _cfg()
    p = init_transducer(jax.random.PRNGKey(0), cfg)
    assert "decoder" in p
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 80, 80))
    out = transducer_forward(
        p, feats, jnp.array([80, 64]),
        jnp.array([[1, 2, 3], [4, 5, 0]]), jnp.array([3, 2]),
        cfg, deterministic=True,
    )
    assert "loss_attn" in out
    assert np.isfinite(float(out["loss"]))
    assert np.isfinite(float(out["loss_attn"]))


def test_bidirectional_decoder():
    cfg = _cfg(reverse_weight=0.3)
    p = init_transducer(jax.random.PRNGKey(0), cfg)
    assert "right_decoder" in p["decoder"]
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, 80, 80))
    out = transducer_forward(
        p, feats, jnp.array([80]), jnp.array([[1, 2, 3]]), jnp.array([3]),
        cfg, deterministic=True,
    )
    assert np.isfinite(float(out["loss_attn"]))
