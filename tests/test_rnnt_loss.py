"""RNN-T loss vs a direct NumPy lattice DP + autodiff gradient checks.

(torchaudio is not in this environment, so the oracle is a straightforward
O(T*U) float64 DP implementing the same recursion torchaudio documents.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conformer_tpu.ops.rnnt import (
    gather_lattice_log_probs,
    rnnt_loss,
    rnnt_loss_from_log_probs,
)


def numpy_rnnt_nll(log_probs, labels, t_len, u_len, blank=0):
    """Naive float64 forward DP for one sequence. log_probs [T, U+1, V]."""

    def lse(a, b):
        m = max(a, b)
        if m == -np.inf:
            return -np.inf
        return m + np.log(np.exp(a - m) + np.exp(b - m))

    alpha = np.full((t_len, u_len + 1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(t_len):
        for u in range(u_len + 1):
            if t == 0 and u == 0:
                continue
            a = alpha[t - 1, u] + log_probs[t - 1, u, blank] if t > 0 else -np.inf
            b = (
                alpha[t, u - 1] + log_probs[t, u - 1, labels[u - 1]]
                if u > 0
                else -np.inf
            )
            alpha[t, u] = lse(a, b)
    return -(alpha[t_len - 1, u_len] + log_probs[t_len - 1, u_len, blank])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_rnnt_matches_numpy_dp(seed):
    rng = np.random.default_rng(seed)
    b, t, u, v = 3, 9, 5, 7
    logits = rng.normal(size=(b, t, u + 1, v)).astype(np.float32)
    labels = rng.integers(1, v, size=(b, u)).astype(np.int32)
    t_lens = rng.integers(u + 1, t + 1, size=b).astype(np.int32)
    u_lens = rng.integers(1, u + 1, size=b).astype(np.int32)

    nll = np.asarray(
        rnnt_loss(
            jnp.asarray(logits),
            jnp.asarray(labels),
            jnp.asarray(t_lens),
            jnp.asarray(u_lens),
            reduction="none",
        )
    )
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1)).astype(
        np.float64
    )
    for i in range(b):
        expect = numpy_rnnt_nll(lp[i], labels[i], int(t_lens[i]), int(u_lens[i]))
        np.testing.assert_allclose(nll[i], expect, rtol=1e-4, atol=1e-4)


def test_rnnt_single_step_lattice():
    # T=1, U=0: loss = -log p(blank at (0,0))
    logits = np.zeros((1, 1, 1, 4), np.float32)
    logits[0, 0, 0] = [2.0, 0.0, 0.0, 0.0]
    nll = rnnt_loss(
        jnp.asarray(logits),
        jnp.zeros((1, 0), jnp.int32),
        jnp.array([1]),
        jnp.array([0]),
        reduction="none",
    )
    lp = jax.nn.log_softmax(jnp.asarray(logits[0, 0, 0]))
    np.testing.assert_allclose(np.asarray(nll)[0], -float(lp[0]), rtol=1e-5)


def test_rnnt_gradient_finite_difference():
    rng = np.random.default_rng(5)
    b, t, u, v = 1, 4, 2, 5
    logits = rng.normal(size=(b, t, u + 1, v)).astype(np.float64)
    labels = np.array([[1, 3]], np.int32)
    t_lens = np.array([4], np.int32)
    u_lens = np.array([2], np.int32)

    def loss_fn(lg):
        return rnnt_loss(
            lg, jnp.asarray(labels), jnp.asarray(t_lens), jnp.asarray(u_lens),
            reduction="sum",
        )

    x = jnp.asarray(logits, jnp.float32)
    g = np.asarray(jax.grad(loss_fn)(x))
    eps = 1e-3
    idxs = [(0, 0, 0, 0), (0, 1, 1, 3), (0, 3, 2, 0), (0, 2, 0, 1)]
    for idx in idxs:
        e = np.zeros_like(logits)
        e[idx] = eps
        fplus = float(loss_fn(jnp.asarray(logits + e, jnp.float32)))
        fminus = float(loss_fn(jnp.asarray(logits - e, jnp.float32)))
        fd = (fplus - fminus) / (2 * eps)
        np.testing.assert_allclose(g[idx], fd, rtol=2e-2, atol=2e-3, err_msg=str(idx))


def test_gather_matches_log_softmax():
    rng = np.random.default_rng(9)
    logits = rng.normal(size=(2, 3, 4, 6)).astype(np.float32)
    labels = np.array([[1, 2, 3], [5, 4, 3]], np.int32)
    lp_blank, lp_emit = gather_lattice_log_probs(jnp.asarray(logits), jnp.asarray(labels), 0)
    full = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    np.testing.assert_allclose(np.asarray(lp_blank), full[..., 0], rtol=1e-5, atol=1e-5)
    for u in range(3):
        np.testing.assert_allclose(
            np.asarray(lp_emit)[:, :, u],
            np.stack([full[i, :, u, labels[i, u]] for i in range(2)]),
            rtol=1e-5,
            atol=1e-5,
        )


def test_rnnt_jits_and_reduces():
    f = jax.jit(lambda lg, la, tl, ul: rnnt_loss(lg, la, tl, ul, reduction="mean"))
    lg = jnp.zeros((2, 5, 4, 8))
    out = f(lg, jnp.ones((2, 3), jnp.int32), jnp.array([5, 4]), jnp.array([3, 2]))
    assert np.isfinite(float(out))
