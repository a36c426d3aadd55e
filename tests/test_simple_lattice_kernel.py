"""Fused simple-lattice kernel vs the XLA reference path (VERDICT r3 #4).

Correctness bar: forward values AND gradients (wrt am and lm) must match
ops.rnnt_pruned.simple_lattice_log_probs, and the full pruned loss must be
invariant to simple_impl.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conformer_tpu.ops.pallas.simple_lattice_kernel import (
    simple_lattice_log_probs_pallas,
)
from conformer_tpu.ops.rnnt_pruned import (
    rnnt_loss_pruned_full,
    simple_lattice_log_probs,
)


@pytest.fixture(scope="module")
def shapes():
    b, t, u, v = 3, 13, 6, 37
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    am = jax.random.normal(k1, (b, t, v)) * 2.0
    lm = jax.random.normal(k2, (b, u + 1, v)) * 2.0
    labels = jax.random.randint(k3, (b, u), 1, v)
    return am, lm, labels


def test_forward_matches_xla(shapes):
    am, lm, labels = shapes
    lpb_ref, lpe_ref = simple_lattice_log_probs(am, lm, labels, blank=0)
    lpb, lpe = simple_lattice_log_probs_pallas(
        am, lm, labels, blank=0, interpret=True
    )
    np.testing.assert_allclose(np.asarray(lpb), np.asarray(lpb_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lpe), np.asarray(lpe_ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_xla(shapes):
    am, lm, labels = shapes

    def loss_ref(am, lm):
        lpb, lpe = simple_lattice_log_probs(am, lm, labels, blank=0)
        return jnp.sum(jnp.sin(lpb) + 0.5 * jnp.cos(lpe))

    def loss_pal(am, lm):
        lpb, lpe = simple_lattice_log_probs_pallas(
            am, lm, labels, blank=0, interpret=True
        )
        return jnp.sum(jnp.sin(lpb) + 0.5 * jnp.cos(lpe))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(am, lm)
    g_pal = jax.grad(loss_pal, argnums=(0, 1))(am, lm)
    for r, p in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


def test_pruned_loss_invariant_to_simple_impl(shapes):
    am, lm, labels = shapes
    b, t, v = am.shape
    u1 = lm.shape[1]
    j = 16
    k = jax.random.PRNGKey(7)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    enc_proj = jax.random.normal(k1, (b, t, j))
    pred_proj = jax.random.normal(k2, (b, u1, j))
    w = jax.random.normal(k3, (j, v)) * 0.3
    bias = jax.random.normal(k4, (v,)) * 0.1
    t_lens = jnp.array([t, t - 2, t - 5])
    u_lens = jnp.array([u1 - 1, u1 - 2, u1 - 3])

    def run(simple_impl):
        return rnnt_loss_pruned_full(
            am, lm, enc_proj, pred_proj, w, bias, labels,
            t_lens, u_lens, s_range=4, blank=0, simple_impl=simple_impl,
        )

    with jax.disable_jit(False):
        s_x, p_x = run("xla")
        s_p, p_p = run("pallas")
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p_p), np.asarray(p_x),
                               rtol=1e-5, atol=1e-5)
