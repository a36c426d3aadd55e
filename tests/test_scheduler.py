"""Batched multi-stream serving: slot pool semantics + micro-batching
scheduler end-to-end (VERDICT r3 next #1).

The correctness bar: a stream decoded through the shared SessionPool —
joining mid-life of other streams, riding micro-batched ticks — must
produce EXACTLY the transcript the B=1 StreamingSession path produces for
the same audio.
"""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conformer_tpu.config import tiny_test_config
from conformer_tpu.decode.greedy import init_greedy_state
from conformer_tpu.decode.stream_batch import (
    init_pool,
    pool_reset_slots,
    pool_step,
)
from conformer_tpu.decode.streaming import new_session, session_accept_chunk
from conformer_tpu.models import encoder as encoder_mod
from conformer_tpu.models.transducer import init_transducer


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    cfg.decode.decoding_chunk_size = 4
    cfg.decode.num_decoding_left_chunks = 2
    p = init_transducer(jax.random.PRNGKey(0), cfg.model)
    return cfg, p


def _chunks(key, n, window, f):
    return [
        jax.random.normal(jax.random.fold_in(key, i), (1, window, f)) * 0.5
        for i in range(n)
    ]


def _run_single(p, cfg, chunks, cache_size, max_hyp_len=64):
    s = new_session(p, cfg.model, cache_size=cache_size,
                    max_hyp_len=max_hyp_len)
    for c in chunks:
        s = session_accept_chunk(p, s, c, cfg.model,
                                 n_steps=cfg.decode.n_steps)
    n = int(s.hyp_len[0])
    return np.asarray(s.hyps)[0, :n].tolist()


@pytest.mark.parametrize("pos_mode", ["default", "ref_abs", "absolute"])
def test_pool_matches_single_sessions_staggered(setup, pos_mode):
    """Three streams joining/leaving at different ticks inside one pool must
    reproduce their individual B=1 session transcripts exactly — in every
    position mode, since per-row EncoderState offsets flow into per-row
    position embeddings (ref_abs parity matrices / absolute sinusoids)."""
    import dataclasses

    cfg, p = setup
    mcfg = cfg.model
    if pos_mode == "ref_abs":
        mcfg = dataclasses.replace(mcfg, rel_mode="ref_abs")
    elif pos_mode == "absolute":
        mcfg = dataclasses.replace(mcfg, use_relative=False)
    if pos_mode != "default":
        # these modes have their own param layout (pos tables / biases)
        cfg = dataclasses.replace(cfg, model=mcfg)
        p = init_transducer(jax.random.PRNGKey(0), mcfg)
    chunk = cfg.decode.decoding_chunk_size
    _, window, _ = encoder_mod.chunk_window_params(chunk)
    cache = chunk * cfg.decode.num_decoding_left_chunks
    f = mcfg.input_dim

    streams = {
        0: _chunks(jax.random.PRNGKey(10), 3, window, f),
        1: _chunks(jax.random.PRNGKey(11), 4, window, f),
        2: _chunks(jax.random.PRNGKey(12), 2, window, f),
    }
    expect = {
        k: _run_single(p, cfg, v, cache) for k, v in streams.items()
    }

    n_slots = 4
    pool = init_pool(p, mcfg, n_slots, cache_size=cache, max_hyp_len=64)
    fresh = init_greedy_state(p, mcfg, 1)

    # tick schedule: stream 0 starts at tick 0, stream 1 at tick 1 (after a
    # slot reset), stream 2 at tick 2 reusing slot 3 mid-pool
    schedule = [  # tick -> {slot: stream-chunk-index}
        {0: (0, 0)},
        {0: (0, 1), 1: (1, 0)},
        {0: (0, 2), 1: (1, 1), 3: (2, 0)},
        {1: (1, 2), 3: (2, 1)},
        {1: (1, 3)},
    ]
    resets = {0: [0], 1: [1], 2: [3]}  # tick -> slots to reset first

    for tick, assignments in enumerate(schedule):
        if tick in resets:
            mask = np.zeros((n_slots,), bool)
            mask[resets[tick]] = True
            pool = pool_reset_slots(pool, jnp.asarray(mask), fresh,
                                    mcfg.blank_id)
        chunks = np.zeros((n_slots, window, f), np.float32)
        active = np.zeros((n_slots,), bool)
        out_valid = np.zeros((n_slots,), np.int32)
        for slot, (sid, ci) in assignments.items():
            chunks[slot] = np.asarray(streams[sid][ci])[0]
            active[slot] = True
            out_valid[slot] = chunk
        pool = pool_step(
            p, pool, jnp.asarray(chunks), jnp.asarray(active),
            jnp.asarray(out_valid), mcfg, n_steps=cfg.decode.n_steps,
        )

    slot_of = {0: 0, 1: 1, 2: 3}
    for sid, slot in slot_of.items():
        n = int(np.asarray(pool.hyp_len)[slot])
        got = np.asarray(pool.hyps)[slot, :n].tolist()
        assert got == expect[sid], (
            f"stream {sid} (slot {slot}): pool {got} != single {expect[sid]}"
        )


def test_pool_inactive_slots_frozen(setup):
    """A tick where a slot is inactive must leave its whole state bitwise
    unchanged."""
    cfg, p = setup
    mcfg = cfg.model
    chunk = cfg.decode.decoding_chunk_size
    _, window, _ = encoder_mod.chunk_window_params(chunk)
    pool = init_pool(p, mcfg, 2, cache_size=8, max_hyp_len=32)

    c0 = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (window, mcfg.input_dim))
    )
    chunks = np.stack([c0, c0])
    # step with only slot 0 active
    pool1 = pool_step(
        p, pool, jnp.asarray(chunks, jnp.float32),
        jnp.asarray([True, False]), jnp.asarray([chunk, chunk], np.int32),
        mcfg,
    )
    for a, b in zip(jax.tree.leaves(_row(pool, 1)),
                    jax.tree.leaves(_row(pool1, 1))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # slot 0 advanced
    assert int(np.asarray(pool1.enc.offset)[0]) == chunk
    assert int(np.asarray(pool1.enc.offset)[1]) == 0


def _row(pool, i):
    return (
        pool.enc.attn_k[:, i], pool.enc.attn_v[:, i],
        pool.enc.attn_len[i], pool.enc.conv_cache[:, i],
        pool.enc.offset[i],
        pool.dec.last_token[i], pool.dec.pred_state.h[:, i],
        pool.dec.pred_state.c[:, i], pool.dec.pred_proj[i],
        pool.hyps[i], pool.hyp_len[i],
    )


def test_featurizer_incremental_matches_batch():
    from conformer_tpu.config import DataConfig
    from conformer_tpu.ops.fbank import fbank_numpy
    from conformer_tpu.serve.scheduler import StreamFeaturizer

    dcfg = DataConfig()
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)

    full = fbank_numpy(
        wav * (1 << 15), sample_rate=dcfg.resample_rate,
        num_mel_bins=dcfg.num_mel_bins, frame_length=dcfg.frame_length,
        frame_shift=dcfg.frame_shift, dither=0.0,
    )
    fz = StreamFeaturizer(dcfg)
    parts = []
    pos = 0
    for size in (100, 1600, 3, 7000, 160, 23000, 500):
        parts.append(fz.feed(wav[pos:pos + size]))
        pos += size
    parts.append(fz.feed(wav[pos:]))
    inc = np.concatenate(parts)
    assert inc.shape == full.shape
    np.testing.assert_allclose(inc, full, rtol=1e-5, atol=1e-5)


def test_scheduler_end_to_end_concurrent(setup):
    """N client threads streaming concurrently through the scheduler get the
    same transcripts as the B=1 session path; late joins + slot reuse."""
    from conformer_tpu.serve.scheduler import PoolFull, StreamScheduler

    cfg, p = setup
    chunk = cfg.decode.decoding_chunk_size
    _, window, _ = encoder_mod.chunk_window_params(chunk)
    stride = 4 * chunk
    cache = chunk * cfg.decode.num_decoding_left_chunks
    f = cfg.model.input_dim

    n_streams = 5
    utts = []
    for i in range(n_streams):
        n_chunks = 2 + i % 3
        t = (n_chunks - 1) * stride + window
        utts.append(
            np.asarray(
                jax.random.normal(jax.random.PRNGKey(100 + i), (t, f))
            ) * 0.5
        )

    def window_chunks(feats):
        out = []
        pos = 0
        while pos + window <= len(feats):
            out.append(jnp.asarray(feats[None, pos:pos + window]))
            pos += stride
        return out

    expect = [
        _run_single(p, cfg, window_chunks(u), cache, max_hyp_len=256)
        for u in utts
    ]

    sched = StreamScheduler(p, cfg, n_slots=3, max_wait_ms=1.0)
    results = [None] * n_streams
    errors = []

    def client(i):
        try:
            while True:
                try:
                    slot = sched.open()
                    break
                except PoolFull:
                    import time as _t

                    _t.sleep(0.01)
            feats = utts[i]
            # drip-feed in uneven pieces
            for start in range(0, len(feats), 5):
                sched.feed_frames(slot, feats[start:start + 5])
            results[i] = sched.close(slot, timeout=120)
        except Exception as e:  # pragma: no cover
            errors.append((i, repr(e)))

    threads = [
        threading.Thread(target=client, args=(i,)) for i in range(n_streams)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    sched.shutdown()
    assert not errors, errors
    for i in range(n_streams):
        assert results[i] is not None, f"stream {i} never finished"
        # the scheduler also flushes the trailing partial chunk the manual
        # reference run drops, so the pool transcript must *extend* the
        # reference's full-chunk transcript
        assert results[i][: len(expect[i])] == expect[i], (
            f"stream {i}: {results[i]} !~ {expect[i]}"
        )
