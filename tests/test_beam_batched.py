"""Batched jitted RNN-T beam search: exactness on a brute-forced tiny case,
consistency properties on larger ones."""

import dataclasses
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from conformer_tpu.config import tiny_test_config
from conformer_tpu.decode.beam_batched import beam_search_batch
from conformer_tpu.decode.greedy import greedy_search_batch
from conformer_tpu.models import joint as joint_mod
from conformer_tpu.models import layers, predictor
from conformer_tpu.models.transducer import init_transducer


def _small_cfg():
    return dataclasses.replace(
        tiny_test_config().model,
        vocab_size=4,
        sos_eos_id=3,
        predictor_num_layers=1,
        predictor_embed_size=8,
        predictor_hidden_size=8,
        predictor_dim=8,
        join_dim=16,
    )


def _alignment_score(p, cfg, enc, tokens):
    """Best alignment score for emitting `tokens` over T frames: max-plus DP
    over the (T, U) lattice using the real predictor/joint."""
    t_max = enc.shape[0]
    u = len(tokens)
    # predictor outputs for prefix lengths 0..u
    pred_projs = []
    st = predictor.init_predictor_state(cfg, 1)
    out, st = predictor.predictor_step(p["predictor"], jnp.array([cfg.blank_id]), st, cfg)
    pred_projs.append(layers.dense(p["joint"]["pred_ffn"], out))
    for tok in tokens:
        out, st = predictor.predictor_step(p["predictor"], jnp.array([tok]), st, cfg)
        pred_projs.append(layers.dense(p["joint"]["pred_ffn"], out))
    enc_proj = layers.dense(p["joint"]["enc_ffn"], enc)  # [T, J]

    def logp(t, uu):
        x = jnp.tanh(enc_proj[t : t + 1] + pred_projs[uu])
        logits = layers.dense(p["joint"]["ffn_out"], x)
        return np.asarray(jax.nn.log_softmax(logits.astype(jnp.float32), -1))[0]

    neg = -1e30
    dp = np.full((t_max + 1, u + 1), neg)
    dp[0, 0] = 0.0
    for t in range(t_max):
        for uu in range(u + 1):
            if dp[t, uu] <= neg:
                continue
            lp = logp(t, uu)
            # blank: consume frame
            dp[t + 1, uu] = max(dp[t + 1, uu], dp[t, uu] + lp[cfg.blank_id])
            # emit next token
            if uu < u:
                dp[t, uu + 1] = max(dp[t, uu + 1], dp[t, uu] + lp[tokens[uu]])
    return dp[t_max, u]


def test_batched_beam_finds_viterbi_on_tiny_case():
    cfg = _small_cfg()
    p = init_transducer(jax.random.PRNGKey(3), cfg)
    t_max = 2
    enc = jax.random.normal(jax.random.PRNGKey(7), (t_max, cfg.encoder_dim))

    # brute force all token sequences up to length 2 over nonblank vocab {1,2}
    best_seq, best_score = [], -np.inf
    for u in range(0, 3):
        for seq in itertools.product([1, 2], repeat=u):
            s = _alignment_score(p, cfg, enc, list(seq))
            if s > best_score:
                best_score, best_seq = s, list(seq)

    # merge_prefixes=False keeps per-slot Viterbi (single-alignment) scores,
    # the quantity the brute-force max-plus DP computes.
    toks, lens, scores = beam_search_batch(
        p, enc[None], jnp.array([t_max]), cfg,
        beam_size=8, max_expansions=2, max_hyp_len=8, merge_prefixes=False,
    )
    got = list(np.asarray(toks[0, 0, : int(lens[0, 0])]))
    np.testing.assert_allclose(float(scores[0, 0]), best_score, rtol=1e-4)
    assert got == best_seq, (got, best_seq, float(scores[0, 0]), best_score)


def test_batched_beam_sorted_and_scores_beat_greedy():
    cfg = tiny_test_config().model
    p = init_transducer(jax.random.PRNGKey(0), cfg)
    enc = jax.random.normal(jax.random.PRNGKey(1), (2, 10, cfg.encoder_dim))
    lens_in = jnp.array([10, 7])
    toks, lens, scores = beam_search_batch(
        p, enc, lens_in, cfg, beam_size=4, max_expansions=2, max_hyp_len=32
    )
    s = np.asarray(scores)
    assert (np.diff(s, axis=1) <= 1e-5).all()
    assert np.isfinite(s[:, 0]).all()


def test_batched_beam_jits_and_respects_lengths():
    cfg = tiny_test_config().model
    p = init_transducer(jax.random.PRNGKey(0), cfg)
    f = jax.jit(
        lambda p, e, l: beam_search_batch(
            p, e, l, cfg, beam_size=2, max_expansions=1, max_hyp_len=8
        )
    )
    enc = jax.random.normal(jax.random.PRNGKey(1), (2, 6, cfg.encoder_dim))
    toks, lens, scores = f(p, enc, jnp.array([6, 0]))
    # zero-length row keeps the empty hypothesis
    assert int(lens[1, 0]) == 0
    assert float(scores[1, 0]) == 0.0


def test_merge_helper_pools_duplicates():
    """_merge_duplicate_prefixes: identical prefixes pool by logsumexp into
    the lowest-index slot; the other copies are killed (-inf)."""
    from conformer_tpu.decode.beam_batched import (
        BeamState,
        _merge_duplicate_prefixes,
    )

    L = 4
    tokens = jnp.array(
        [[[1, 2, 0, 0],    # slot 0: "12"
          [1, 2, 9, 9],    # slot 1: "12" again (junk beyond length ignored)
          [1, 3, 0, 0],    # slot 2: "13"
          [1, 2, 0, 0]]],  # slot 3: "12" (len 1 -> actually "1")
        jnp.int32,
    )
    lengths = jnp.array([[2, 2, 2, 1]], jnp.int32)
    lp = jnp.array([[-1.0, -2.0, -0.5, -3.0]], jnp.float32)
    z = jnp.zeros((1, 1, 4, 2))
    st = BeamState(
        tokens=tokens, lengths=lengths, log_probs=lp,
        pred_h=z, pred_c=z, pred_proj=jnp.zeros((1, 4, 2)),
    )
    out = _merge_duplicate_prefixes(st)
    got = np.asarray(out.log_probs[0])
    want0 = np.logaddexp(-1.0, -2.0)   # slots 0+1 pool into 0
    assert np.isclose(got[0], want0, atol=1e-6)
    assert got[1] < -1e20              # duplicate killed
    assert np.isclose(got[2], -0.5)    # unique: untouched
    assert np.isclose(got[3], -3.0)    # different length: not a duplicate


def test_merged_beam_unique_prefixes_and_dominates_viterbi():
    """With merging on: returned live hypotheses are prefix-unique, and the
    top-1 (forward, sum-over-alignments) score weakly dominates the top-1
    Viterbi (single-alignment) score."""
    cfg = _small_cfg()
    p = init_transducer(jax.random.PRNGKey(5), cfg)
    enc = jax.random.normal(jax.random.PRNGKey(6), (2, 6, cfg.encoder_dim))
    lens_in = jnp.array([6, 4])

    kw = dict(beam_size=4, max_expansions=2, max_hyp_len=8)
    toks_m, lens_m, scores_m = beam_search_batch(
        p, enc, lens_in, cfg, merge_prefixes=True, **kw
    )
    _, _, scores_v = beam_search_batch(
        p, enc, lens_in, cfg, merge_prefixes=False, **kw
    )
    sm, sv = np.asarray(scores_m), np.asarray(scores_v)
    assert (sm[:, 0] >= sv[:, 0] - 1e-5).all(), (sm[:, 0], sv[:, 0])

    tm, lm = np.asarray(toks_m), np.asarray(lens_m)
    for b in range(tm.shape[0]):
        seen = set()
        for k in range(tm.shape[1]):
            if sm[b, k] < -1e20:
                continue
            key = tuple(tm[b, k, : lm[b, k]])
            assert key not in seen, (b, k, key)
            seen.add(key)


def test_merged_beam_matches_host_reference_on_tiny_case():
    """Device merged beam vs the host Graves-style merging beam
    (decode/beam.py) on a case small enough that neither prunes."""
    from conformer_tpu.decode.beam import rnnt_beam_search

    cfg = _small_cfg()
    p = init_transducer(jax.random.PRNGKey(11), cfg)
    t_max = 2
    enc = jax.random.normal(jax.random.PRNGKey(12), (t_max, cfg.encoder_dim))

    host = rnnt_beam_search(p, enc, t_max, cfg, beam_size=8, max_expansions=2)
    toks, lens, scores = beam_search_batch(
        p, enc[None], jnp.array([t_max]), cfg,
        beam_size=8, max_expansions=2, max_hyp_len=8, merge_prefixes=True,
    )
    got = list(np.asarray(toks[0, 0, : int(lens[0, 0])]))
    want_tokens, want_score = host[0]
    np.testing.assert_allclose(float(scores[0, 0]), want_score, rtol=1e-4)
    assert got == want_tokens, (got, want_tokens)


def _blank_biased_params(cfg, bias=4.0, seed=0):
    """Random init with the joint output bias pushed toward blank, so the
    decode has long blank runs (the regime blank_skip_window targets)."""
    p = init_transducer(jax.random.PRNGKey(seed), cfg)
    b = p["joint"]["ffn_out"]["bias"]
    p["joint"]["ffn_out"]["bias"] = b.at[cfg.blank_id].add(bias)
    return p


def test_blank_skip_exact_in_viterbi_mode():
    """merge_prefixes=False keeps every slot live, where the skip condition
    is EXACT: the windowed beam must reproduce the per-frame beam
    bit-for-bit (tokens, lengths, scores)."""
    cfg = tiny_test_config().model
    p = _blank_biased_params(cfg)
    enc = jax.random.normal(jax.random.PRNGKey(1), (3, 24, cfg.encoder_dim))
    lens_in = jnp.array([24, 17, 5])
    kw = dict(beam_size=4, max_expansions=2, max_hyp_len=32,
              merge_prefixes=False)
    t0, l0, s0 = beam_search_batch(p, enc, lens_in, cfg, **kw)
    for w in (4, 8):
        t1, l1, s1 = beam_search_batch(
            p, enc, lens_in, cfg, blank_skip_window=w, **kw
        )
        np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
        np.testing.assert_allclose(
            np.asarray(s0), np.asarray(s1), rtol=1e-5, atol=1e-5
        )


def test_blank_skip_merged_top1_matches():
    """With prefix merging (dead slots exist) the skip is an approximation;
    the top hypothesis must still match the exact beam on a blank-dominant
    model, and scores must agree."""
    cfg = tiny_test_config().model
    p = _blank_biased_params(cfg, bias=5.0, seed=3)
    enc = jax.random.normal(jax.random.PRNGKey(2), (3, 30, cfg.encoder_dim))
    lens_in = jnp.array([30, 22, 9])
    kw = dict(beam_size=4, max_expansions=2, max_hyp_len=32)
    t0, l0, s0 = beam_search_batch(p, enc, lens_in, cfg, **kw)
    t1, l1, s1 = beam_search_batch(
        p, enc, lens_in, cfg, blank_skip_window=8, **kw
    )
    for b in range(3):
        n = int(l0[b, 0])
        assert int(l1[b, 0]) == n
        np.testing.assert_array_equal(
            np.asarray(t0)[b, 0, :n], np.asarray(t1)[b, 0, :n]
        )
    np.testing.assert_allclose(
        np.asarray(s0)[:, 0], np.asarray(s1)[:, 0], rtol=1e-4, atol=1e-4
    )


def test_blank_skip_jits_and_zero_length():
    cfg = tiny_test_config().model
    p = _blank_biased_params(cfg)
    f = jax.jit(
        lambda p, e, l: beam_search_batch(
            p, e, l, cfg, beam_size=2, max_expansions=1, max_hyp_len=8,
            blank_skip_window=4,
        )
    )
    enc = jax.random.normal(jax.random.PRNGKey(1), (2, 6, cfg.encoder_dim))
    toks, lens, scores = f(p, enc, jnp.array([6, 0]))
    assert int(lens[1, 0]) == 0
    assert float(scores[1, 0]) == 0.0
