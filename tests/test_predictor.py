"""LSTM predictor vs torch.nn.LSTM (the reference's backend, predictor.py:30)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import torch

from conformer_tpu.config import tiny_test_config
from conformer_tpu.models import predictor


def _make_torch_lstm(params, cfg):
    lstm = torch.nn.LSTM(
        input_size=cfg.predictor_embed_size,
        hidden_size=cfg.predictor_hidden_size,
        num_layers=cfg.predictor_num_layers,
        batch_first=True,
    )
    with torch.no_grad():
        for li, lp in enumerate(params["rnn"]):
            getattr(lstm, f"weight_ih_l{li}").copy_(
                torch.tensor(np.asarray(lp["w_ih"]).T)
            )
            getattr(lstm, f"weight_hh_l{li}").copy_(
                torch.tensor(np.asarray(lp["w_hh"]).T)
            )
            getattr(lstm, f"bias_ih_l{li}").copy_(torch.tensor(np.asarray(lp["b_ih"])))
            getattr(lstm, f"bias_hh_l{li}").copy_(torch.tensor(np.asarray(lp["b_hh"])))
    return lstm


def test_predictor_matches_torch_lstm():
    cfg = dataclasses.replace(tiny_test_config().model, predictor_num_layers=2)
    p = predictor.init_predictor(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (3, 7), 0, cfg.vocab_size)

    ours = np.asarray(predictor_out := predictor.predictor_forward(p, tokens, cfg))

    lstm = _make_torch_lstm(p, cfg)
    emb = torch.tensor(np.asarray(p["embed"]["embedding"]))[
        torch.tensor(np.asarray(tokens))
    ]
    with torch.no_grad():
        y, _ = lstm(emb)
        w = torch.tensor(np.asarray(p["projection"]["kernel"]))
        b = torch.tensor(np.asarray(p["projection"]["bias"]))
        ref = (y @ w + b).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_predictor_step_matches_forward():
    """Stepping token-by-token must equal the full-sequence forward."""
    cfg = tiny_test_config().model
    p = predictor.init_predictor(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 5), 0, cfg.vocab_size)
    full = np.asarray(predictor.predictor_forward(p, tokens, cfg))

    state = predictor.init_predictor_state(cfg, 2)
    outs = []
    for u in range(5):
        out, state = predictor.predictor_step(p, tokens[:, u], state, cfg)
        outs.append(np.asarray(out))
    stepped = np.stack(outs, axis=1)
    np.testing.assert_allclose(stepped, full, rtol=1e-5, atol=1e-6)


def test_predictor_step_padding_keeps_state():
    cfg = tiny_test_config().model
    p = predictor.init_predictor(jax.random.PRNGKey(0), cfg)
    state = predictor.init_predictor_state(cfg, 2)
    tok = jnp.array([3, 4])
    _, st1 = predictor.predictor_step(p, tok, state, cfg)
    _, st2 = predictor.predictor_step(
        p, tok, st1, cfg, padding=jnp.array([1, 0])
    )
    # row 0 padded: state unchanged; row 1 advanced
    np.testing.assert_allclose(np.asarray(st2.h[:, 0]), np.asarray(st1.h[:, 0]))
    assert not np.allclose(np.asarray(st2.h[:, 1]), np.asarray(st1.h[:, 1]))
