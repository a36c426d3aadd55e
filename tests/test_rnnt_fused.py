"""Fused (chunked-remat) RNN-T loss == naive full-lattice loss, incl. grads."""

import jax
import jax.numpy as jnp
import numpy as np

from conformer_tpu.ops.rnnt import rnnt_loss, rnnt_loss_fused


def _setup(seed=0, b=2, t=19, u=5, j=16, v=23):
    rng = np.random.default_rng(seed)
    enc_proj = jnp.asarray(rng.normal(size=(b, t, j)), jnp.float32)
    pred_proj = jnp.asarray(rng.normal(size=(b, u + 1, j)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(j, v)) * 0.3, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(v,)) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.integers(1, v, size=(b, u)), jnp.int32)
    t_lens = jnp.asarray([t, t - 4], jnp.int32)
    u_lens = jnp.asarray([u, u - 2], jnp.int32)
    return enc_proj, pred_proj, w, bias, labels, t_lens, u_lens


def _naive(enc_proj, pred_proj, w, bias, labels, t_lens, u_lens):
    logits = jnp.tanh(enc_proj[:, :, None, :] + pred_proj[:, None, :, :]) @ w + bias
    return rnnt_loss(logits, labels, t_lens, u_lens, reduction="sum")


def test_fused_matches_naive_forward():
    args = _setup()
    naive = float(_naive(*args))
    fused = float(rnnt_loss_fused(*args, reduction="sum", t_chunk=8))
    np.testing.assert_allclose(fused, naive, rtol=1e-5)
    # chunk size not dividing T
    fused2 = float(rnnt_loss_fused(*args, reduction="sum", t_chunk=7))
    np.testing.assert_allclose(fused2, naive, rtol=1e-5)


def test_fused_matches_naive_gradients():
    enc_proj, pred_proj, w, bias, labels, t_lens, u_lens = _setup(1)

    def f_naive(e, p, w_, b_):
        return _naive(e, p, w_, b_, labels, t_lens, u_lens)

    def f_fused(e, p, w_, b_):
        return rnnt_loss_fused(
            e, p, w_, b_, labels, t_lens, u_lens, reduction="sum", t_chunk=4
        )

    g_naive = jax.grad(f_naive, argnums=(0, 1, 2, 3))(enc_proj, pred_proj, w, bias)
    g_fused = jax.grad(f_fused, argnums=(0, 1, 2, 3))(enc_proj, pred_proj, w, bias)
    for gn, gf, name in zip(g_naive, g_fused, ["enc", "pred", "w", "b"]):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gn), rtol=2e-4, atol=1e-5, err_msg=name
        )


def test_fused_jits():
    args = _setup(2)
    f = jax.jit(lambda *a: rnnt_loss_fused(*a, t_chunk=8))
    assert np.isfinite(float(f(*args)))
