"""Regression tests for the round-5 ADVICE/VERDICT fixes:

- eager dataset mode (reference NormalCustomDataset parity,
  src/dataset.py:106,185-187)
- scheduler PoolFull / Backpressure admission control
- Prefetcher close() then next() raises StopIteration (no hang)
- native audio runtime ABI version guard
"""

import time

import numpy as np
import pytest

from conformer_tpu.data.prefetch import Prefetcher


# ---------------------------------------------------------------- eager mode

def test_eager_dataset_len_getitem(tmp_path):
    import json
    import os

    from conformer_tpu.config import DataConfig
    from conformer_tpu.data import audio
    from conformer_tpu.data.dataset import AsrDataset, eval_config

    rng = np.random.default_rng(0)
    entries = []
    for i, text in enumerate(["AB", "BA", "AABB"]):
        wav = (0.1 * rng.standard_normal(8000)).astype(np.float32)
        path = os.path.join(tmp_path, f"u{i}.wav")
        audio.save_wav(path, wav, 16000)
        entries.append({"key": f"u{i}", "wav_path": path, "transcript": text})
    lst = os.path.join(tmp_path, "data.list")
    with open(lst, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    voc = os.path.join(tmp_path, "vocab.txt")
    with open(voc, "w") as f:
        for w, i in [("<blank>", 0), ("<unk>", 1), ("A", 2), ("B", 3),
                     ("_", 4), ("<sos/eos>", 5)]:
            f.write(f"{w} {i}\n")

    cfg = eval_config(
        DataConfig(
            train_data_list_path=lst, dev_data_list_path=lst,
            test_data_list_path=lst, vocab_path=voc, bpe_model=None,
            dither=0.0, filter_data=False,
        ),
        batch_size=2,
    )
    lazy = AsrDataset(cfg, mode="dev", shard_id=0, num_shards=1)
    eager = AsrDataset(cfg, mode="dev", shard_id=0, num_shards=1, eager=True)

    lazy_batches = list(lazy)
    assert len(eager) == len(lazy_batches)
    for i in range(len(eager)):
        np.testing.assert_array_equal(eager[i]["feats"], lazy_batches[i]["feats"])
    # iteration serves the cached list
    again = list(eager)
    assert len(again) == len(eager)
    # lazy dataset refuses map-style access
    with pytest.raises(TypeError):
        len(lazy)
    with pytest.raises(TypeError):
        lazy[0]


# ------------------------------------------------------------------ prefetch

def test_prefetch_close_then_next_stops():
    pf = Prefetcher(iter(range(100)), depth=2)
    next(pf)
    pf.close()
    # after close, iteration terminates (StopIteration) instead of hanging
    deadline = time.monotonic() + 5.0
    with pytest.raises(StopIteration):
        while time.monotonic() < deadline:
            next(pf)
    assert time.monotonic() < deadline


def test_prefetch_close_races_producer_exit():
    # Producer finishes (short iterable) while consumer closes: next() must
    # still terminate even if the sentinel was never enqueued.
    for _ in range(20):
        pf = Prefetcher(iter([1]), depth=1)
        pf.close()
        with pytest.raises(StopIteration):
            next(pf)
            next(pf)


# ------------------------------------------------------------------ abi guard

def test_native_abi_guard(tmp_path):
    from conformer_tpu.data import native

    lib = native._load()
    if lib is None:
        pytest.skip("native runtime not built")
    assert lib.crt_abi_version() == native._EXPECTED_ABI

    # a library without the expected version symbol must be refused
    import subprocess

    src = tmp_path / "stale.cc"
    src.write_text(
        'extern "C" long crt_decode_wav(const unsigned char*, long, float*,'
        " int*) { return -1; }\n"
    )
    so = tmp_path / "libstale.so"
    subprocess.run(
        ["g++", "-shared", "-fPIC", "-o", str(so), str(src)], check=True
    )
    native._load.cache_clear()
    old = native._LIB_PATHS[:]
    try:
        native._LIB_PATHS[:] = [str(so)]
        with pytest.warns(RuntimeWarning, match="ABI v1"):
            assert native._load() is None
    finally:
        native._LIB_PATHS[:] = old
        native._load.cache_clear()


# ------------------------------------------------------- scheduler exceptions

def test_poolfull_and_backpressure_types():
    from conformer_tpu.serve.scheduler import Backpressure, PoolFull

    assert issubclass(PoolFull, RuntimeError)
    assert issubclass(Backpressure, RuntimeError)
    assert not issubclass(PoolFull, Backpressure)
