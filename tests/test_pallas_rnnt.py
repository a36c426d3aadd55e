"""Pallas wavefront RNN-T lattice DP vs the pure-JAX oracle (interpret)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from conformer_tpu.ops.rnnt import rnnt_loss_from_log_probs
from conformer_tpu.ops.pallas.rnnt_kernel import (
    rnnt_loss_from_log_probs_pallas,
)


def _rand_lattice(b=3, t=11, u1=7, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    lp_blank = jax.nn.log_sigmoid(jax.random.normal(k1, (b, t, u1)))
    lp_emit = jax.nn.log_sigmoid(jax.random.normal(k2, (b, t, u1)))
    t_lens = jnp.array([t, t - 3, t - 1][:b], jnp.int32)
    u_lens = jnp.array([u1 - 1, 2, 0][:b], jnp.int32)
    return lp_blank, lp_emit, t_lens, u_lens


def test_forward_matches_reference():
    lpb, lpe, tl, ul = _rand_lattice()
    ref = rnnt_loss_from_log_probs(lpb, lpe, tl, ul)
    got = rnnt_loss_from_log_probs_pallas(
        lpb, lpe, tl, ul, d_tile=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_reference():
    lpb, lpe, tl, ul = _rand_lattice(seed=1)
    w = jnp.array([1.0, 0.5, 2.0])  # non-uniform cotangents

    def loss_ref(a, b):
        return jnp.sum(w * rnnt_loss_from_log_probs(a, b, tl, ul))

    def loss_pal(a, b):
        return jnp.sum(
            w * rnnt_loss_from_log_probs_pallas(
                a, b, tl, ul, d_tile=8, interpret=True
            )
        )

    gr = jax.grad(loss_ref, argnums=(0, 1))(lpb, lpe)
    gp = jax.grad(loss_pal, argnums=(0, 1))(lpb, lpe)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]),
                               rtol=1e-4, atol=1e-5)


def test_single_frame_and_empty_labels():
    # t_len = 1 / u_len = 0 boundary: nll = -lp_blank[0, 0]
    lpb, lpe, _, _ = _rand_lattice(b=2, t=4, u1=3, seed=2)
    tl = jnp.array([1, 2], jnp.int32)
    ul = jnp.array([0, 0], jnp.int32)
    ref = rnnt_loss_from_log_probs(lpb, lpe, tl, ul)
    got = rnnt_loss_from_log_probs_pallas(
        lpb, lpe, tl, ul, d_tile=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(got[0]), -float(lpb[0, 0, 0]), rtol=1e-6)


def test_large_shapes_nondivisible():
    # exercises B/U1/D padding paths with d_tile not dividing T+U1-1
    lpb, lpe, _, _ = _rand_lattice(b=5, t=37, u1=19, seed=3)
    tl = jnp.array([37, 20, 1, 37, 9], jnp.int32)
    ul = jnp.array([18, 0, 0, 5, 8], jnp.int32)
    ref = rnnt_loss_from_log_probs(lpb, lpe, tl, ul)
    got = rnnt_loss_from_log_probs_pallas(
        lpb, lpe, tl, ul, d_tile=16, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def s_ref(a):
        return jnp.sum(rnnt_loss_from_log_probs(a, lpe, tl, ul))

    def s_pal(a):
        return jnp.sum(rnnt_loss_from_log_probs_pallas(
            a, lpe, tl, ul, d_tile=16, interpret=True
        ))

    np.testing.assert_allclose(
        np.asarray(jax.grad(s_pal)(lpb)), np.asarray(jax.grad(s_ref)(lpb)),
        rtol=1e-4, atol=1e-5,
    )


def test_fused_loss_with_pallas_lattice_matches_xla():
    """rnnt_loss_fused(lattice_impl='pallas') == 'xla', value and grads
    (interpret mode so the kernel runs on CPU)."""
    from unittest import mock

    from conformer_tpu.ops import rnnt as rnnt_mod
    from conformer_tpu.ops.pallas import rnnt_kernel as rk

    rng = np.random.default_rng(7)
    b, t, u, j, v = 2, 13, 5, 8, 11
    enc_proj = jnp.asarray(rng.normal(size=(b, t, j)), jnp.float32)
    pred_proj = jnp.asarray(rng.normal(size=(b, u + 1, j)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(j, v)) * 0.3, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(v,)) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.integers(1, v, size=(b, u)), jnp.int32)
    tl = jnp.asarray([t, t - 4], jnp.int32)
    ul = jnp.asarray([u, u - 2], jnp.int32)

    def f(e, impl):
        return rnnt_mod.rnnt_loss_fused(
            e, pred_proj, w, bias, labels, tl, ul,
            reduction="sum", t_chunk=8, lattice_impl=impl,
        )

    ref_v, ref_g = jax.value_and_grad(lambda e: f(e, "xla"))(enc_proj)
    with mock.patch.object(
        rk, "rnnt_loss_from_log_probs_pallas",
        functools.partial(rk.rnnt_loss_from_log_probs_pallas, interpret=True),
    ):
        got_v, got_g = jax.value_and_grad(lambda e: f(e, "pallas"))(enc_proj)
    np.testing.assert_allclose(float(got_v), float(ref_v), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                               rtol=1e-4, atol=1e-5)
