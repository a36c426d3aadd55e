"""Vectorized greedy RNN-T vs a direct Python port of the reference loop.

The oracle reimplements basic_greedy_search (/root/reference/src/model.py:
214-269) per-utterance in Python over OUR pure predictor/joint functions,
so the test isolates the lax.while_loop vectorization.
"""

import jax
import jax.numpy as jnp
import numpy as np

from conformer_tpu.config import tiny_test_config
from conformer_tpu.decode.greedy import greedy_search_batch
from conformer_tpu.models import joint as joint_mod
from conformer_tpu.models import predictor
from conformer_tpu.models.transducer import init_transducer


def python_greedy(p, cfg, enc_out, enc_len, n_steps=64):
    """Reference-algorithm oracle for one utterance (enc_out [T, D])."""
    hyps = []
    tok = jnp.array([cfg.blank_id], jnp.int32)
    cache = predictor.init_predictor_state(cfg, 1)
    pred_out = new_cache = None
    t = 0
    prev_nonblank = True
    noblk = 0
    while t < enc_len:
        if prev_nonblank:
            pred_out, new_cache = predictor.predictor_step(
                p["predictor"], tok, cache, cfg
            )
        logits = joint_mod.joint_step(p["joint"], enc_out[t : t + 1], pred_out)
        best = int(jnp.argmax(logits, axis=-1)[0])
        if best != cfg.blank_id:
            hyps.append(best)
            prev_nonblank = True
            noblk += 1
            tok = jnp.array([best], jnp.int32)
            cache = new_cache
        if best == cfg.blank_id or noblk >= n_steps:
            if best == cfg.blank_id:
                prev_nonblank = False
            t += 1
            noblk = 0
    return hyps


def test_greedy_batch_matches_python_reference():
    cfg = tiny_test_config().model
    p = init_transducer(jax.random.PRNGKey(0), cfg)
    b, t, d = 3, 12, cfg.encoder_dim
    enc_out = jax.random.normal(jax.random.PRNGKey(1), (b, t, d)) * 2.0
    enc_lens = jnp.array([12, 9, 5])

    hyps, lens, _ = greedy_search_batch(
        p, enc_out, enc_lens, cfg, n_steps=4, max_hyp_len=64
    )
    for i in range(b):
        expect = python_greedy(p, cfg, enc_out[i], int(enc_lens[i]), n_steps=4)
        got = list(np.asarray(hyps[i][: int(lens[i])]))
        assert got == expect, f"row {i}: {got} != {expect}"


def test_greedy_respects_length_zero():
    cfg = tiny_test_config().model
    p = init_transducer(jax.random.PRNGKey(0), cfg)
    enc_out = jax.random.normal(jax.random.PRNGKey(1), (2, 6, cfg.encoder_dim))
    hyps, lens, _ = greedy_search_batch(
        p, enc_out, jnp.array([0, 6]), cfg, n_steps=4, max_hyp_len=16
    )
    assert int(lens[0]) == 0


def test_windowed_greedy_matches_window_one():
    cfg = tiny_test_config().model
    p = init_transducer(jax.random.PRNGKey(0), cfg)
    b, t, d = 4, 23, cfg.encoder_dim
    enc_out = jax.random.normal(jax.random.PRNGKey(5), (b, t, d)) * 2.0
    enc_lens = jnp.array([23, 17, 9, 1])
    ref_h, ref_l, _ = greedy_search_batch(
        p, enc_out, enc_lens, cfg, n_steps=3, max_hyp_len=16, window=1
    )
    for w in (2, 5, 8, 32):
        h, l, _ = greedy_search_batch(
            p, enc_out, enc_lens, cfg, n_steps=3, max_hyp_len=16, window=w
        )
        np.testing.assert_array_equal(np.asarray(l), np.asarray(ref_l), f"w={w}")
        np.testing.assert_array_equal(np.asarray(h), np.asarray(ref_h), f"w={w}")
