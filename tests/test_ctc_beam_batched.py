"""Device-side batched CTC prefix beam vs the host reference implementation.

The host `ctc_prefix_beam_search` is the standard Hannun prefix beam (the
reference's WeNet lineage decode); `ctc_prefix_beam_batch` must match it
exactly when per-frame pruning is disabled (top_c = V), since then both
enumerate identical transition sets.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conformer_tpu.decode.ctc_beam_batched import (
    ctc_prefix_beam_batch,
    ctc_prefix_beam_decode_batch,
)
from conformer_tpu.decode.ctc_decode import ctc_prefix_beam_search


def _rand_log_probs(key, bsz, t, v, peaked=False):
    logits = jax.random.normal(key, (bsz, t, v))
    if peaked:
        logits = logits * 4.0
    return jax.nn.log_softmax(logits, axis=-1)


def _host_beam(log_probs, lengths, beam_size, v):
    """Run the host reference per utterance with pruning disabled."""
    out = []
    for i in range(log_probs.shape[0]):
        out.append(
            ctc_prefix_beam_search(
                np.asarray(log_probs[i]), int(lengths[i]),
                beam_size=beam_size, blank=0, top_k=v,
            )
        )
    return out


def _device_beam_as_sets(toks, lens, scores):
    """[B, K, L] -> list of {prefix: score} (dead -inf slots dropped)."""
    toks, lens, scores = map(np.asarray, (toks, lens, scores))
    out = []
    for b in range(toks.shape[0]):
        d = {}
        for k in range(toks.shape[1]):
            if scores[b, k] < -1e29:
                continue
            d[tuple(toks[b, k, : lens[b, k]].tolist())] = float(scores[b, k])
        out.append(d)
    return out


class TestExactParity:
    def test_matches_host_exact_search(self):
        bsz, t, v, k = 3, 12, 6, 4
        lp = _rand_log_probs(jax.random.PRNGKey(0), bsz, t, v)
        lengths = jnp.array([12, 9, 5])
        toks, lens, scores = jax.jit(
            lambda x, n: ctc_prefix_beam_batch(
                x, n, beam_size=k, blank=0, max_hyp_len=16, top_c=v
            )
        )(lp, lengths)
        host = _host_beam(lp, lengths, k, v)
        dev = _device_beam_as_sets(toks, lens, scores)
        for b in range(bsz):
            host_d = {p: s for p, s in host[b]}
            assert set(dev[b]) == set(host_d), f"utt {b} prefix sets differ"
            for p, s in host_d.items():
                assert dev[b][p] == pytest.approx(s, abs=2e-3), (b, p)
            # best-first ordering: slot 0 is the host's argmax
            best_host = max(host_d, key=host_d.get)
            best_dev = tuple(
                np.asarray(toks)[b, 0, : int(np.asarray(lens)[b, 0])].tolist()
            )
            assert best_dev == best_host

    def test_repeat_heavy_distribution(self):
        # Peaked frames force repeated argmaxes -> exercises the
        # repeat-with-gap vs repeat-without-gap split and the merge pass.
        bsz, t, v, k = 2, 10, 4, 4
        lp = _rand_log_probs(jax.random.PRNGKey(7), bsz, t, v, peaked=True)
        lengths = jnp.array([10, 10])
        toks, lens, scores = ctc_prefix_beam_batch(
            lp, lengths, beam_size=k, blank=0, max_hyp_len=12, top_c=v
        )
        host = _host_beam(lp, lengths, k, v)
        dev = _device_beam_as_sets(toks, lens, scores)
        for b in range(bsz):
            host_d = {p: s for p, s in host[b]}
            assert set(dev[b]) == set(host_d)
            for p, s in host_d.items():
                assert dev[b][p] == pytest.approx(s, abs=2e-3)

    def test_blank_dominated(self):
        # Mostly-blank frames: the empty prefix must survive with the right
        # mass (stay transitions dominate; extends keep dying).
        bsz, t, v, k = 1, 8, 5, 3
        logits = jnp.full((bsz, t, v), -3.0).at[:, :, 0].set(3.0)
        logits = logits + 0.1 * jax.random.normal(
            jax.random.PRNGKey(3), (bsz, t, v)
        )
        lp = jax.nn.log_softmax(logits, axis=-1)
        lengths = jnp.array([8])
        toks, lens, scores = ctc_prefix_beam_batch(
            lp, lengths, beam_size=k, blank=0, max_hyp_len=8, top_c=v
        )
        host = _host_beam(lp, lengths, k, v)
        dev = _device_beam_as_sets(toks, lens, scores)
        host_d = {p: s for p, s in host[0]}
        assert set(dev[0]) == set(host_d)
        assert int(np.asarray(lens)[0, 0]) == len(max(host_d, key=host_d.get))

    def test_length_masking(self):
        # Frames past `lengths` must not contribute: truncated input ==
        # masked input.
        v, k = 5, 4
        lp = _rand_log_probs(jax.random.PRNGKey(11), 1, 10, v)
        full = ctc_prefix_beam_batch(
            lp, jnp.array([6]), beam_size=k, blank=0, max_hyp_len=12, top_c=v
        )
        trunc = ctc_prefix_beam_batch(
            lp[:, :6], jnp.array([6]), beam_size=k, blank=0,
            max_hyp_len=12, top_c=v,
        )
        for a, b in zip(full, trunc):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            )


class TestPruned:
    def test_pruned_top1_matches_exact_on_peaked(self):
        bsz, t, v, k = 2, 12, 10, 4
        lp = _rand_log_probs(jax.random.PRNGKey(5), bsz, t, v, peaked=True)
        lengths = jnp.array([12, 8])
        exact = ctc_prefix_beam_batch(
            lp, lengths, beam_size=k, blank=0, max_hyp_len=16, top_c=v
        )
        pruned = ctc_prefix_beam_batch(
            lp, lengths, beam_size=k, blank=0, max_hyp_len=16, top_c=4
        )
        for b in range(bsz):
            e_len = int(np.asarray(exact[1])[b, 0])
            p_len = int(np.asarray(pruned[1])[b, 0])
            assert (
                np.asarray(exact[0])[b, 0, :e_len].tolist()
                == np.asarray(pruned[0])[b, 0, :p_len].tolist()
            )


class TestEndToEnd:
    def test_decode_batch_matches_host_wrapper(self):
        from conformer_tpu.config import tiny_test_config
        from conformer_tpu.models import ctc_head
        from conformer_tpu.models.transducer import encode, init_transducer

        cfg = tiny_test_config().model
        p = init_transducer(jax.random.PRNGKey(0), cfg)
        feats = jax.random.normal(jax.random.PRNGKey(1), (2, 96, 80))
        feat_lens = jnp.array([96, 64])
        enc_out, enc_lens = encode(p, feats, feat_lens, cfg)
        logits = ctc_head.ctc_logits(p["ctc"], enc_out)
        lp = np.asarray(
            jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        )
        # Host search with pruning disabled (the batch wrapper's default
        # top_k=16 prunes; the device call below runs exact).
        host = [
            ctc_prefix_beam_search(
                lp[b], int(np.asarray(enc_lens)[b]), 4, cfg.blank_id,
                top_k=cfg.vocab_size,
            )[0][0]
            for b in range(2)
        ]
        toks, lens, _ = jax.jit(
            lambda pp, eo, el: ctc_prefix_beam_decode_batch(
                pp, eo, el, cfg, beam_size=4, max_hyp_len=32,
                top_c=cfg.vocab_size,
            )
        )(p, enc_out, enc_lens)
        for b in range(2):
            n = int(np.asarray(lens)[b, 0])
            assert tuple(np.asarray(toks)[b, 0, :n].tolist()) == host[b]
