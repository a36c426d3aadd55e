"""Data pipeline: synthetic wavs through the full stage chain."""

import json
import os

import numpy as np
import pytest

from conformer_tpu.config import DataConfig
from conformer_tpu.data import audio, processor as P
from conformer_tpu.data.dataset import AsrDataset, eval_config, shard_list
from conformer_tpu.data.tokenizer import CharEncoder, Tokenizer


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    entries = []
    texts = ["HELLO WORLD", "JAX ON TPU", "SPEECH", "A B C D", "TEST WAV FILE"]
    for i, text in enumerate(texts):
        secs = 0.5 + 0.3 * i
        wav = (0.3 * np.sin(2 * np.pi * 440 * np.arange(int(16000 * secs)) / 16000)
               + 0.01 * rng.standard_normal(int(16000 * secs))).astype(np.float32)
        path = os.path.join(d, f"utt{i}.wav")
        audio.save_wav(path, wav, 16000)
        entries.append({"key": f"utt{i}", "wav_path": path, "transcript": text})
    list_path = os.path.join(d, "data.list")
    with open(list_path, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    # char vocab
    chars = sorted(set("".join(texts).replace(" ", "_")) | {"_"})
    vocab = {"<blank>": 0, "<unk>": 1}
    for c in chars:
        vocab[c] = len(vocab)
    vocab["<sos/eos>"] = len(vocab)
    vocab_path = os.path.join(d, "vocab.txt")
    with open(vocab_path, "w") as f:
        for w, idx in vocab.items():
            f.write(f"{w} {idx}\n")
    return {"dir": str(d), "list": list_path, "vocab": vocab_path, "n": len(texts)}


def _cfg(data_dir, **kw):
    return DataConfig(
        train_data_list_path=data_dir["list"],
        dev_data_list_path=data_dir["list"],
        test_data_list_path=data_dir["list"],
        vocab_path=data_dir["vocab"],
        bpe_model=None,
        dither=0.0,
        speed_perturb=True,
        spec_aug=True,
        shuffle=True,
        shuffle_size=4,
        sort=True,
        sort_size=4,
        filter_data=False,
        bucket_boundaries=(64, 128, 256),
        max_frames_in_batch=512,
        max_label_len=32,
        **kw,
    )


def test_wav_roundtrip(tmp_path):
    wav = (0.5 * np.sin(np.linspace(0, 100, 8000))).astype(np.float32)
    p = str(tmp_path / "x.wav")
    audio.save_wav(p, wav, 16000)
    loaded, sr = audio.load_audio(p)
    assert sr == 16000
    np.testing.assert_allclose(loaded, wav, atol=1e-3)


def test_resample_halves_length():
    wav = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    out = audio.resample(wav, 16000, 8000)
    assert abs(len(out) - 8000) <= 1


def test_speed_perturb_length():
    wav = np.zeros(16000, np.float32)
    fast = audio.speed_perturb(wav, 16000, 1.1)
    slow = audio.speed_perturb(wav, 16000, 0.9)
    assert abs(len(fast) - int(16000 / 1.1)) <= 2
    assert abs(len(slow) - int(16000 / 0.9)) <= 2


def test_char_tokenizer_roundtrip(data_dir):
    tok = Tokenizer(vocab={"<blank>": 0, "<unk>": 1, "A": 2, "B": 3, "_": 4})
    tokens, ids = tok.encode("AB A")
    assert tokens == ["A", "B", "_", "A"]
    assert ids == [2, 3, 4, 2]
    assert tok.decode_ids(ids) == "AB A"


def test_tokenizer_cjk_mixing():
    tok = Tokenizer(vocab={"<unk>": 1, "你": 2, "好": 3, "A": 4})
    tokens, ids = tok.encode("你好A")
    assert tokens == ["你", "好", "A"]
    assert ids == [2, 3, 4]


def test_train_dataset_end_to_end(data_dir):
    ds = AsrDataset(_cfg(data_dir), mode="train", shard_id=0, num_shards=1)
    ds.set_epoch(0)
    batches = list(ds)
    assert batches
    total_rows = 0
    for b in batches:
        feats = b["feats"]
        assert feats.ndim == 3 and feats.shape[2] == 80
        assert feats.shape[1] in (64, 128, 256)
        assert b["labels"].shape[1] == 32
        valid = b["feat_lengths"] > 0
        total_rows += int(valid.sum())
        assert (b["feat_lengths"][valid] <= feats.shape[1]).all()
    assert total_rows == data_dir["n"]


def test_eval_dataset_static_batching(data_dir):
    cfg = eval_config(_cfg(data_dir), batch_size=2)
    ds = AsrDataset(cfg, mode="dev", shard_id=0, num_shards=1)
    batches = list(ds)
    assert sum(len(b["keys"]) for b in batches) == data_dir["n"]
    # deterministic (no perturb/dither): same output twice
    b1 = list(ds)[0]["feats"]
    b2 = list(ds)[0]["feats"]
    np.testing.assert_array_equal(b1, b2)


def test_sharding_partitions(data_dir):
    data = load = list(range(10))
    s0 = shard_list(data, 0, 0, 2)
    s1 = shard_list(data, 0, 1, 2)
    assert sorted(s0 + s1) == data
    assert shard_list(data, 0, 0, 2) == s0  # epoch-deterministic


def test_spec_aug_masks_zeros():
    rng = np.random.default_rng(0)
    feat = np.ones((100, 80), np.float32)
    out = next(P.spec_aug(iter([{"feat": feat}]), rng=rng))["feat"]
    assert (out == 0).any()
    assert out.shape == (100, 80)


def test_dynamic_batch_budget():
    samples = [{"feat": np.zeros((t, 80)), "key": str(t), "label": [1],
                "transcript": "x"} for t in [100, 100, 100, 300, 50]]
    batches = list(P.dynamic_batch(iter(samples), max_frames_in_batch=300))
    for b in batches:
        longest = max(s["feat"].shape[0] for s in b)
        assert longest * len(b) <= 300 or len(b) == 1
