"""Fused joint-lattice kernel vs the XLA chunked gather (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from conformer_tpu.ops.rnnt import (
    rnnt_lattice_log_probs_fused,
    rnnt_loss_fused,
)
from conformer_tpu.ops.pallas.joint_kernel import (
    joint_lattice_log_probs_pallas,
)


def _setup(seed=0, b=2, t=19, u=5, j=16, v=33):
    rng = np.random.default_rng(seed)
    enc_proj = jnp.asarray(rng.normal(size=(b, t, j)), jnp.float32)
    pred_proj = jnp.asarray(rng.normal(size=(b, u + 1, j)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(j, v)) * 0.3, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(v,)) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.integers(1, v, size=(b, u)), jnp.int32)
    t_lens = jnp.asarray([t, t - 4], jnp.int32)
    u_lens = jnp.asarray([u, u - 2], jnp.int32)
    return enc_proj, pred_proj, w, bias, labels, t_lens, u_lens


def test_forward_matches_xla_gather():
    enc_proj, pred_proj, w, bias, labels, _, _ = _setup()
    ref_b, ref_e = rnnt_lattice_log_probs_fused(
        enc_proj, pred_proj, w, bias, labels, blank=0, t_chunk=8
    )
    lab = jnp.pad(labels, ((0, 0), (0, 1)))
    got_b, got_e = joint_lattice_log_probs_pallas(
        enc_proj, pred_proj, w, bias, lab, blank=0,
        t_tile=8, v_tile=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref_b),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(ref_e),
                               rtol=1e-5, atol=1e-5)


def test_loss_and_grads_match_xla_path():
    enc_proj, pred_proj, w, bias, labels, tl, ul = _setup(seed=1)

    def loss(impl, e, p, w_, b_):
        return rnnt_loss_fused(
            e, p, w_, b_, labels, tl, ul, reduction="sum", t_chunk=8,
            joint_impl=impl,
        )

    ref_v, ref_g = jax.value_and_grad(
        lambda *a: loss("xla", *a), argnums=(0, 1, 2, 3)
    )(enc_proj, pred_proj, w, bias)

    import functools
    from unittest import mock
    from conformer_tpu.ops.pallas import joint_kernel as jk

    with mock.patch.object(
        jk, "joint_lattice_log_probs_pallas",
        functools.partial(jk.joint_lattice_log_probs_pallas,
                          t_tile=8, v_tile=128, interpret=True),
    ):
        got_v, got_g = jax.value_and_grad(
            lambda *a: loss("pallas", *a), argnums=(0, 1, 2, 3)
        )(enc_proj, pred_proj, w, bias)

    np.testing.assert_allclose(float(got_v), float(ref_v), rtol=1e-5)
    names = ["d_enc", "d_pred", "d_w", "d_bias"]
    for name, a, b in zip(names, got_g, ref_g):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=name,
        )


def test_nondivisible_shapes():
    # T, U1, V all non-multiples of the tiles
    enc_proj, pred_proj, w, bias, labels, tl, ul = _setup(
        seed=2, b=3, t=13, u=6, j=8, v=45
    )
    tl = jnp.asarray([13, 9, 1], jnp.int32)
    ul = jnp.asarray([6, 0, 3], jnp.int32)
    ref_b, ref_e = rnnt_lattice_log_probs_fused(
        enc_proj, pred_proj, w, bias, labels, blank=0, t_chunk=8
    )
    lab = jnp.pad(labels, ((0, 0), (0, 1)))
    got_b, got_e = joint_lattice_log_probs_pallas(
        enc_proj, pred_proj, w, bias, lab, blank=0,
        t_tile=8, v_tile=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref_b),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(ref_e),
                               rtol=1e-5, atol=1e-5)
