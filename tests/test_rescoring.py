"""Attention rescoring decode smoke."""

import dataclasses

import jax
import jax.numpy as jnp

from conformer_tpu.config import tiny_test_config
from conformer_tpu.decode.rescoring import attention_rescoring
from conformer_tpu.models.transducer import init_transducer

import pytest


def test_attention_rescoring_runs():
    cfg = dataclasses.replace(
        tiny_test_config().model, decoder_num_layers=1, attention_weight=0.3
    )
    p = init_transducer(jax.random.PRNGKey(0), cfg)
    enc = jax.random.normal(jax.random.PRNGKey(1), (2, 8, cfg.encoder_dim))
    out = attention_rescoring(
        p, enc, jnp.array([8, 6]), cfg, beam_size=4, ctc_weight=0.5
    )
    assert len(out) == 2
    assert all(isinstance(h, list) for h in out)


def test_attention_rescoring_requires_decoder():
    cfg = tiny_test_config().model
    p = init_transducer(jax.random.PRNGKey(0), cfg)
    enc = jax.random.normal(jax.random.PRNGKey(1), (1, 4, cfg.encoder_dim))
    with pytest.raises(ValueError):
        attention_rescoring(p, enc, jnp.array([4]), cfg)


def _host_score(dec_params, memory, memory_mask, hyp, cfg, reverse=False):
    """Per-hypothesis reference: sum log P(hyp + eos | memory), one row."""
    import numpy as np
    from conformer_tpu.models import decoder as decoder_mod
    from conformer_tpu.models import masks

    tokens = list(reversed(hyp)) if reverse else list(hyp)
    u = len(tokens)
    labels = jnp.asarray([tokens], jnp.int32) if u else jnp.zeros((1, 0), jnp.int32)
    ys_in, ys_out = masks.add_sos_eos(
        labels, jnp.asarray([u], jnp.int32),
        cfg.sos_eos_id, cfg.sos_eos_id, cfg.ignore_id,
    )
    logits = decoder_mod.transformer_decoder_forward(
        dec_params, memory, memory_mask, ys_in, jnp.asarray([u + 1]), cfg
    )
    logp = np.asarray(jax.nn.log_softmax(logits.astype(jnp.float32), -1))[0]
    out = np.asarray(ys_out[0])
    return float(sum(logp[pos, out[pos]] for pos in range(u + 1)))


def test_batched_scorer_matches_per_hyp_host_scores():
    """The single jitted [N, U] decoder scorer == per-hypothesis scoring,
    including padded rows, the empty hypothesis, and the reversed (R2L)
    direction."""
    import numpy as np
    from conformer_tpu.decode.rescoring import batched_decoder_scores

    cfg = dataclasses.replace(
        tiny_test_config().model, decoder_num_layers=1, attention_weight=0.3,
        reverse_weight=0.3,
    )
    p = init_transducer(jax.random.PRNGKey(2), cfg)
    t = 6
    memory_row = jax.random.normal(jax.random.PRNGKey(3), (1, t, cfg.encoder_dim))
    hyp_lists = [[1, 3, 2], [2], [], [1, 1]]
    u_max = 5
    hyps = np.zeros((len(hyp_lists), u_max), np.int32)
    hyp_lens = np.zeros((len(hyp_lists),), np.int32)
    for i, h in enumerate(hyp_lists):
        hyps[i, : len(h)] = h
        hyp_lens[i] = len(h)
    memory = jnp.tile(memory_row, (len(hyp_lists), 1, 1))
    memory_mask = jnp.ones((len(hyp_lists), t), bool)

    for direction, dec_key in ((False, "left_decoder"), (True, "right_decoder")):
        dec = p["decoder"][dec_key]
        got = np.asarray(
            jax.jit(
                lambda d, m, mm, hy, hl, r=direction: batched_decoder_scores(
                    d, m, mm, hy, hl, cfg, reverse=r
                )
            )(dec, memory, memory_mask, jnp.asarray(hyps), jnp.asarray(hyp_lens))
        )
        want = [
            _host_score(dec, memory_row, memory_mask[:1], h, cfg, reverse=direction)
            for h in hyp_lists
        ]
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_device_rescoring_matches_host_path():
    """attention_rescoring_batch (fully jitted: device prefix beam + device
    winner pick) returns the same hypotheses as the host-assisted
    attention_rescoring when both run the n-best unpruned (top_k == top_c ==
    vocab_size, achieved here with a vocab small enough that the host
    default top_k=16 never prunes)."""
    import numpy as np
    from conformer_tpu.decode.rescoring import attention_rescoring_batch

    cfg = dataclasses.replace(
        tiny_test_config().model, decoder_num_layers=1, attention_weight=0.3,
        vocab_size=12,
    )
    p = init_transducer(jax.random.PRNGKey(4), cfg)
    enc = jax.random.normal(jax.random.PRNGKey(5), (3, 10, cfg.encoder_dim))
    enc_lens = jnp.array([10, 7, 4])
    host = attention_rescoring(
        p, enc, enc_lens, cfg, beam_size=4, ctc_weight=0.5, max_hyp_len=16
    )
    toks, lens = jax.jit(
        lambda pp, eo, el: attention_rescoring_batch(
            pp, eo, el, cfg, beam_size=4, ctc_weight=0.5,
            max_hyp_len=16, top_c=cfg.vocab_size,
        )
    )(p, enc, enc_lens)
    for b in range(3):
        n = int(np.asarray(lens)[b])
        assert np.asarray(toks)[b, :n].tolist() == host[b], b
