"""Pruned RNN-T loss: exact equality with the full loss when the band covers
the whole lattice; sane approximation + valid grads when pruned."""

import jax
import jax.numpy as jnp
import numpy as np

from conformer_tpu.ops.rnnt import rnnt_loss, rnnt_loss_fused
from conformer_tpu.ops.rnnt_pruned import (
    prune_bounds_from_occupancy,
    rnnt_loss_pruned,
    rnnt_loss_pruned_full,
    simple_lattice_log_probs,
)


def _setup(seed=0, b=2, t=14, u=5, j=12, v=17):
    rng = np.random.default_rng(seed)
    enc_proj = jnp.asarray(rng.normal(size=(b, t, j)), jnp.float32)
    pred_proj = jnp.asarray(rng.normal(size=(b, u + 1, j)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(j, v)) * 0.3, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(v,)) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.integers(1, v, size=(b, u)), jnp.int32)
    t_lens = jnp.asarray([t, t - 3], jnp.int32)
    u_lens = jnp.asarray([u, u - 2], jnp.int32)
    am = jnp.asarray(rng.normal(size=(b, t, v)) * 0.5, jnp.float32)
    lm = jnp.asarray(rng.normal(size=(b, u + 1, v)) * 0.5, jnp.float32)
    return enc_proj, pred_proj, w, bias, labels, t_lens, u_lens, am, lm


def test_full_band_equals_unpruned():
    enc_proj, pred_proj, w, bias, labels, t_lens, u_lens, am, lm = _setup()
    b, t = enc_proj.shape[0], enc_proj.shape[1]
    u1 = pred_proj.shape[1]
    s_begin = jnp.zeros((b, t), jnp.int32)      # full band
    pruned = rnnt_loss_pruned(
        enc_proj, pred_proj, w, bias, labels, s_begin, t_lens, u_lens,
        s_range=u1,
    )
    full = rnnt_loss_fused(
        enc_proj, pred_proj, w, bias, labels, t_lens, u_lens,
        reduction="none", t_chunk=8,
    )
    np.testing.assert_allclose(np.asarray(pruned), np.asarray(full), rtol=1e-4)


def test_simple_lattice_matches_direct():
    _, _, _, _, labels, t_lens, u_lens, am, lm = _setup(1)
    lpb, lpe = simple_lattice_log_probs(am, lm, labels, t_chunk=4)
    logits = am[:, :, None, :] + lm[:, None, :, :]
    full = jax.nn.log_softmax(logits, axis=-1)
    np.testing.assert_allclose(np.asarray(lpb), np.asarray(full[..., 0]), rtol=1e-5, atol=1e-5)


def test_bounds_are_monotone_and_cover_terminal():
    _, _, _, _, labels, t_lens, u_lens, am, lm = _setup(2)
    lpb, lpe = simple_lattice_log_probs(am, lm, labels)
    occ = jnp.exp(lpb)  # any positive surrogate
    for s_range in (2, 3, 4):
        sb = np.asarray(
            prune_bounds_from_occupancy(occ, t_lens, u_lens, s_range)
        )
        assert (np.diff(sb, axis=1) >= 0).all()
        assert (np.diff(sb, axis=1) <= s_range - 1).all()
        assert (sb[:, 0] == 0).all()
        for i in range(sb.shape[0]):
            tl, ul = int(t_lens[i]), int(u_lens[i])
            assert sb[i, tl - 1] <= ul <= sb[i, tl - 1] + s_range - 1, (
                i, s_range, sb[i, tl - 1], ul
            )


def test_two_pass_recipe_close_to_full_and_differentiable():
    enc_proj, pred_proj, w, bias, labels, t_lens, u_lens, am, lm = _setup(3)

    def loss_fn(enc_proj, pred_proj, w, bias, am, lm):
        simple, pruned = rnnt_loss_pruned_full(
            am, lm, enc_proj, pred_proj, w, bias, labels,
            t_lens, u_lens, s_range=4,
        )
        return jnp.sum(0.5 * simple + pruned)

    val, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5))(
        enc_proj, pred_proj, w, bias, am, lm
    )
    assert np.isfinite(float(val))
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
    # pruned nll should be close to (and >=) the exact nll
    _, pruned = rnnt_loss_pruned_full(
        am, lm, enc_proj, pred_proj, w, bias, labels, t_lens, u_lens, s_range=4
    )
    full = rnnt_loss_fused(
        enc_proj, pred_proj, w, bias, labels, t_lens, u_lens,
        reduction="none",
    )
    p, f = np.asarray(pruned), np.asarray(full)
    # pruning can only remove probability mass
    assert (p >= f - 1e-3).all()
    # with RANDOM weights occupancy is diffuse, so the band misses real
    # mass; just bound the gap loosely (trained models concentrate near the
    # alignment diagonal and the gap shrinks to ~0)
    assert (p - f < 10.0).all(), (p, f)
