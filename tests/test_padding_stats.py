"""Padding-waste accounting for bucket batching (VERDICT r2 weak #7,
SURVEY hard part #3): the bucket ladder's padded-frame waste is measured on
a LibriSpeech-like length distribution and must stay under the ~15% budget
that keeps the throughput north star reachable."""

import numpy as np

from conformer_tpu.data import processor as P


def _fake_samples(durations_s):
    for i, dur in enumerate(durations_s):
        t = int(dur * 100)  # 10 ms shift
        yield {
            "key": f"u{i}",
            "feat": np.zeros((t, 80), np.float32),
            "label": [1, 2, 3],
            "transcript": "a b c",
        }


def _librispeech_like_durations(n=4000, seed=0):
    """train-960-shaped durations: broad 2-14 s body plus the heavy
    12-16.7 s segment mass (the corpus splits long recordings at ~16.7 s)."""
    rng = np.random.default_rng(seed)
    body = rng.uniform(2.0, 14.0, size=int(n * 0.45))
    long = rng.uniform(12.0, 16.7, size=n - body.size)
    return np.concatenate([body, long])


def test_padding_stats_accounting_exact():
    stats = P.PaddingStats()
    # two utterances of 100/200 frames into the 256 bucket with 2 rows
    out = list(
        P.bucket_batch(
            _fake_samples([1.0, 2.0]),
            bucket_boundaries=(256,),
            max_frames_in_batch=512,
            stats=stats,
        )
    )
    assert len(out) == 1 and out[0][1] == 256 and out[0][2] == 2
    assert stats.valid_frames == 300
    assert stats.total_frames == 512
    assert abs(stats.efficiency - 300 / 512) < 1e-9


def test_flush_counts_dummy_rows_as_waste():
    stats = P.PaddingStats()
    list(
        P.bucket_batch(
            _fake_samples([1.0]),                  # 100 frames, bucket rows=4
            bucket_boundaries=(256,),
            max_frames_in_batch=1024,
            stats=stats,
        )
    )
    assert stats.total_rows == 4 and stats.valid_rows == 1
    assert stats.summary()["dummy_rows"] == 3
    assert stats.total_frames == 256 * 4


def test_librispeech_like_waste_under_budget():
    stats = P.PaddingStats()
    for _ in P.bucket_batch(
        _fake_samples(_librispeech_like_durations()),
        bucket_boundaries=(256, 512, 768, 1024, 1280, 1650),
        max_frames_in_batch=8000,
        stats=stats,
    ):
        pass
    s = stats.summary()
    assert s["padded_frame_waste"] < 0.15, s
    # and the ladder genuinely beats the single-bucket fallback
    single = P.PaddingStats()
    for _ in P.bucket_batch(
        _fake_samples(_librispeech_like_durations()),
        bucket_boundaries=(1650,),
        max_frames_in_batch=8000,
        stats=single,
    ):
        pass
    assert stats.efficiency > single.efficiency + 0.05, (
        stats.summary(), single.summary(),
    )


def test_trainer_logs_padding_efficiency(tmp_path):
    """fit() with bucket batching emits a padding_efficiency metric."""
    import json
    import os

    from conformer_tpu.config import tiny_test_config
    from conformer_tpu.data import audio
    from conformer_tpu.train.loop import Trainer

    d = tmp_path
    rng = np.random.default_rng(0)
    entries = []
    for i, text in enumerate(["AB", "BA", "AAB", "BB"]):
        wav = (0.2 * np.sin(2 * np.pi * 400 * np.arange(8000) / 16000)
               + 0.01 * rng.standard_normal(8000)).astype(np.float32)
        path = os.path.join(d, f"u{i}.wav")
        audio.save_wav(path, wav, 16000)
        entries.append({"key": f"u{i}", "wav_path": path, "transcript": text})
    lst = os.path.join(d, "data.list")
    with open(lst, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    vocab = os.path.join(d, "vocab.txt")
    with open(vocab, "w") as f:
        for w, i in [("<blank>", 0), ("<unk>", 1), ("A", 2), ("B", 3),
                     ("_", 4), ("<sos/eos>", 5)]:
            f.write(f"{w} {i}\n")

    cfg = tiny_test_config()
    cfg.model.vocab_size = 6
    cfg.model.sos_eos_id = 5
    cfg.model.encoder_num_layers = 1
    cfg.data.train_data_list_path = lst
    cfg.data.dev_data_list_path = lst
    cfg.data.vocab_path = vocab
    cfg.data.dither = 0.0
    cfg.data.speed_perturb = False
    cfg.data.spec_aug = False
    cfg.data.filter_data = False
    cfg.data.batch_type = "bucket"
    cfg.data.bucket_boundaries = (64,)
    cfg.data.max_frames_in_batch = 256
    cfg.data.max_label_len = 8
    cfg.train.checkpoint_dir = str(d / "ckpt")
    cfg.train.num_sanity_val_steps = 0
    cfg.train.log_every = 1
    cfg.train.val_check_interval = 10**9
    cfg.train.max_steps = 2
    cfg.train.max_epochs = 1
    cfg.train.mesh_data = 1
    cfg.train.mesh_model = 1
    tr = Trainer(cfg)
    tr.fit()
    metrics_path = os.path.join(cfg.train.checkpoint_dir, "metrics.jsonl")
    assert os.path.exists(metrics_path)
    rows = [json.loads(line) for line in open(metrics_path)]
    effs = [r for r in rows if "train_padding_efficiency" in r]
    assert effs, rows
    assert 0.0 < effs[-1]["train_padding_efficiency"] <= 1.0
