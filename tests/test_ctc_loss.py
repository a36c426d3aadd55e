"""CTC loss vs torch.nn.CTCLoss (the reference's backend, src/decoder.py:15)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from conformer_tpu.ops.ctc import ctc_loss, ctc_loss_from_logits


def torch_ctc(log_probs, input_lengths, labels, label_lengths, blank=0):
    lp = torch.tensor(np.asarray(log_probs)).transpose(0, 1)  # [T, B, V]
    loss = torch.nn.CTCLoss(blank=blank, reduction="none")(
        lp,
        torch.tensor(np.asarray(labels)),
        torch.tensor(np.asarray(input_lengths)),
        torch.tensor(np.asarray(label_lengths)),
    )
    return loss.numpy()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ctc_matches_torch(seed):
    rng = np.random.default_rng(seed)
    b, t, u, v = 4, 20, 7, 11
    logits = rng.normal(size=(b, t, v)).astype(np.float32)
    log_probs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    input_lengths = rng.integers(u * 2 + 2, t + 1, size=b).astype(np.int32)
    label_lengths = rng.integers(1, u + 1, size=b).astype(np.int32)
    labels = rng.integers(1, v, size=(b, u)).astype(np.int32)

    ours = np.asarray(
        ctc_loss(
            jnp.asarray(log_probs),
            jnp.asarray(input_lengths),
            jnp.asarray(labels),
            jnp.asarray(label_lengths),
        )
    )
    ref = torch_ctc(log_probs, input_lengths, labels, label_lengths)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_ctc_repeated_labels():
    rng = np.random.default_rng(7)
    b, t, u, v = 2, 15, 6, 8
    log_probs = np.asarray(
        jax.nn.log_softmax(jnp.asarray(rng.normal(size=(b, t, v)).astype(np.float32)))
    )
    labels = np.array([[2, 2, 3, 3, 2, 2], [1, 1, 1, 1, 1, 1]], np.int32)
    input_lengths = np.array([15, 14], np.int32)
    label_lengths = np.array([6, 5], np.int32)
    ours = np.asarray(
        ctc_loss(
            jnp.asarray(log_probs),
            jnp.asarray(input_lengths),
            jnp.asarray(labels),
            jnp.asarray(label_lengths),
        )
    )
    ref = torch_ctc(log_probs, input_lengths, labels, label_lengths)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_ctc_gradient_matches_torch():
    rng = np.random.default_rng(3)
    b, t, u, v = 2, 12, 4, 6
    logits = rng.normal(size=(b, t, v)).astype(np.float32)
    input_lengths = np.array([12, 10], np.int32)
    labels = rng.integers(1, v, size=(b, u)).astype(np.int32)
    label_lengths = np.array([4, 3], np.int32)

    def loss_fn(lg):
        return jnp.sum(
            ctc_loss_from_logits(
                lg,
                jnp.asarray(input_lengths),
                jnp.asarray(labels),
                jnp.asarray(label_lengths),
            )
        )

    g_ours = np.asarray(jax.grad(loss_fn)(jnp.asarray(logits)))

    lg_t = torch.tensor(logits, requires_grad=True)
    lp_t = torch.log_softmax(lg_t, dim=-1).transpose(0, 1)
    loss = torch.nn.CTCLoss(blank=0, reduction="none")(
        lp_t,
        torch.tensor(labels),
        torch.tensor(input_lengths),
        torch.tensor(label_lengths),
    ).sum()
    loss.backward()
    np.testing.assert_allclose(g_ours, lg_t.grad.numpy(), rtol=1e-3, atol=1e-4)


def test_ctc_jits():
    f = jax.jit(ctc_loss)
    lp = jax.nn.log_softmax(jnp.zeros((1, 5, 4)), axis=-1)
    out = f(lp, jnp.array([5]), jnp.array([[1, 2]]), jnp.array([2]))
    assert np.isfinite(np.asarray(out)).all()
