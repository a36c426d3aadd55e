"""Pallas fused CTC DP kernel vs the XLA lax.scan oracle (interpret mode).

The oracle (ops/ctc.py) carries torch-CTCLoss semantics (reference
src/decoder.py:15,21); the kernel must be a drop-in: same per-sequence NLL,
matching gradients (the kernel's VJP is the analytic occupancy gradient,
the oracle's is autodiff through the scan).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conformer_tpu.ops.ctc import ctc_loss
from conformer_tpu.ops.pallas.ctc_kernel import ctc_loss_pallas


def _case(b=4, t=37, u=9, v=50, seed=0):
    k0, k1 = jax.random.split(jax.random.PRNGKey(seed))
    log_probs = jax.nn.log_softmax(jax.random.normal(k0, (b, t, v)), -1)
    labels = jax.random.randint(k1, (b, u), 1, v)
    # Force a repeated label so the s-2 skip mask is exercised.
    labels = labels.at[0, 3].set(labels[0, 2])
    t_lens = jnp.array([t, t - 5, 13, 1][:b], jnp.int32)
    u_lens = jnp.array([u, 4, 0, 0][:b], jnp.int32)
    return log_probs, t_lens, labels, u_lens


def test_forward_matches_oracle():
    lp, tl, lab, ul = _case()
    ref = ctc_loss(lp, tl, lab, ul)
    got = ctc_loss_pallas(lp, tl, lab, ul, t_tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_unaligned_shapes():
    # B not a multiple of the batch tile, T not a multiple of t_tile,
    # S = 2U+1 nowhere near a lane multiple.
    lp, tl, lab, ul = _case(b=3, t=29, u=5, v=33, seed=3)
    ref = ctc_loss(lp, tl, lab, ul)
    got = ctc_loss_pallas(lp, tl, lab, ul, t_tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_oracle():
    lp, tl, lab, ul = _case(seed=1)
    w = jnp.arange(1.0, lp.shape[0] + 1.0)  # non-uniform cotangents

    def loss_ref(x):
        return jnp.sum(w * ctc_loss(x, tl, lab, ul))

    def loss_pal(x):
        return jnp.sum(
            w * ctc_loss_pallas(x, tl, lab, ul, t_tile=8, interpret=True)
        )

    gr = jax.grad(loss_ref)(lp)
    gp = jax.grad(loss_pal)(lp)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                               rtol=1e-4, atol=1e-5)


def test_grad_zero_beyond_valid_length():
    lp, tl, lab, ul = _case(seed=2)
    g = jax.grad(
        lambda x: jnp.sum(
            ctc_loss_pallas(x, tl, lab, ul, t_tile=8, interpret=True)
        )
    )(lp)
    t_idx = jnp.arange(lp.shape[1])
    invalid = np.asarray(t_idx[None, :] >= tl[:, None])
    assert float(jnp.max(jnp.abs(jnp.asarray(g)[invalid]))) == 0.0


def test_empty_labels_row():
    # u_len = 0 rows: NLL reduces to -sum(log p(blank)) over valid frames.
    lp, tl, lab, ul = _case(seed=4)
    ul = jnp.zeros_like(ul)
    got = ctc_loss_pallas(lp, tl, lab, ul, t_tile=8, interpret=True)
    blanks = lp[:, :, 0]
    mask = jnp.arange(lp.shape[1])[None, :] < tl[:, None]
    expect = -jnp.sum(jnp.where(mask, blanks, 0.0), axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


def test_ctc_head_flag_routes_through_kernel(monkeypatch):
    """ModelConfig.use_pallas_ctc must switch ctc_head_loss onto the kernel."""
    import conformer_tpu.ops.pallas.ctc_kernel as ck
    from conformer_tpu.config import ModelConfig
    from conformer_tpu.models.ctc_head import ctc_head_loss, init_ctc_head

    cfg = ModelConfig(
        vocab_size=20, encoder_dim=16, encoder_num_layers=1, num_heads=2,
        hidden_dim=32, input_dim=8, dropout=0.0,
    )
    p = init_ctc_head(jax.random.PRNGKey(0), cfg)
    enc = jax.random.normal(jax.random.PRNGKey(1), (2, 12, cfg.encoder_dim))
    enc_lens = jnp.array([12, 7], jnp.int32)
    labels = jax.random.randint(jax.random.PRNGKey(2), (2, 4), 1, 20)
    lab_lens = jnp.array([4, 2], jnp.int32)

    calls = []
    real = ck.ctc_loss_pallas

    def spy(*args, **kw):
        calls.append(1)
        return real(*args, **kw, interpret=True)

    monkeypatch.setattr(ck, "ctc_loss_pallas", spy)
    base = ctc_head_loss(p, enc, enc_lens, labels, lab_lens, cfg)
    assert not calls
    import dataclasses

    cfg_k = dataclasses.replace(cfg, use_pallas_ctc=True)
    got = ctc_head_loss(p, enc, enc_lens, labels, lab_lens, cfg_k)
    assert calls
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=1e-5, atol=1e-5)
