"""Trainer end-to-end on synthetic data: loss decreases, checkpoints work."""

import json
import os

import jax
import numpy as np
import pytest

from conformer_tpu.config import Config, tiny_test_config
from conformer_tpu.data import audio
from conformer_tpu.train.loop import Trainer
from conformer_tpu.train.optimizer import warmup_lr_schedule


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    d = tmp_path_factory.mktemp("ws")
    rng = np.random.default_rng(0)
    texts = ["AB", "BA", "AAB", "BB"]
    entries = []
    for i, text in enumerate(texts):
        wav = (
            0.2 * np.sin(2 * np.pi * (300 + 200 * i) * np.arange(8000) / 16000)
            + 0.01 * rng.standard_normal(8000)
        ).astype(np.float32)
        path = os.path.join(d, f"u{i}.wav")
        audio.save_wav(path, wav, 16000)
        entries.append({"key": f"u{i}", "wav_path": path, "transcript": text})
    lst = os.path.join(d, "data.list")
    with open(lst, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    vocab_path = os.path.join(d, "vocab.txt")
    with open(vocab_path, "w") as f:
        for w, i in [("<blank>", 0), ("<unk>", 1), ("A", 2), ("B", 3),
                     ("_", 4), ("<sos/eos>", 5)]:
            f.write(f"{w} {i}\n")
    return {"dir": str(d), "list": lst, "vocab": vocab_path}


def make_cfg(ws, tmp_path) -> Config:
    cfg = tiny_test_config()
    cfg.model.vocab_size = 6
    cfg.model.sos_eos_id = 5
    cfg.model.encoder_num_layers = 1
    cfg.model.hidden_dim = 64
    cfg.data.train_data_list_path = ws["list"]
    cfg.data.dev_data_list_path = ws["list"]
    cfg.data.test_data_list_path = ws["list"]
    cfg.data.vocab_path = ws["vocab"]
    cfg.data.dither = 0.0
    cfg.data.speed_perturb = False
    cfg.data.spec_aug = False
    cfg.data.filter_data = False
    cfg.data.batch_type = "static"
    cfg.data.batch_size = 4
    cfg.data.max_label_len = 8
    cfg.train.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.train.accum_grad = 1
    cfg.train.num_sanity_val_steps = 0
    cfg.train.log_every = 1000
    cfg.train.val_check_interval = 10**9
    cfg.train.warmup_steps = 5
    cfg.train.lr = 3e-3
    cfg.train.mesh_data = 1
    cfg.train.mesh_model = 1
    return cfg


def test_warmup_schedule_matches_reference_formula():
    sched = warmup_lr_schedule(1e-3, 25000)
    import jax.numpy as jnp

    # step index is 0-based; reference step_num = last_epoch+1 is 1-based
    for step, expect in [(0, 1e-3 * 25000**0.5 * 1 * 25000**-1.5),
                         (24999, 1e-3)]:
        got = float(sched(jnp.asarray(step)))
        np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_overfit_tiny(workspace, tmp_path):
    cfg = make_cfg(workspace, tmp_path)
    trainer = Trainer(cfg)
    from conformer_tpu.data.dataset import AsrDataset

    ds = AsrDataset(cfg.data, mode="train", tokenizer=trainer.tokenizer,
                    shard_id=0, num_shards=1)
    ds.set_epoch(0)
    batches = list(ds)
    first = None
    last = None
    for it in range(25):
        m = trainer.train_step([batches[0]])
        if first is None:
            first = m["loss"]
        last = m["loss"]
    assert last < first * 0.7, (first, last)

    # checkpoint roundtrip
    path = trainer.save(wer=0.5)
    assert os.path.exists(path) and "wer_0.5" in path
    step_before = int(trainer.state["step"])
    loss_before = trainer.train_step([batches[0]])["loss"]

    trainer2 = Trainer(cfg)
    trainer2.restore(cfg.train.checkpoint_dir)
    assert int(trainer2.state["step"]) == step_before
    # same forward loss from restored params (deterministic batch)
    from conformer_tpu.models.transducer import transducer_forward
    import jax.numpy as jnp

    b = batches[0]
    out1 = transducer_forward(
        trainer2.state["params"], jnp.asarray(b["feats"]),
        jnp.asarray(b["feat_lengths"]), jnp.asarray(b["labels"]),
        jnp.asarray(b["label_lengths"]), cfg.model, deterministic=True,
    )
    assert np.isfinite(float(out1["loss"]))

    # validation produces a WER + prediction dump
    wer = trainer.validate(
        AsrDataset(cfg.data, mode="dev", tokenizer=trainer.tokenizer,
                   shard_id=0, num_shards=1)
    )
    assert 0.0 <= wer
    assert os.path.exists(os.path.join(cfg.train.checkpoint_dir, "tmp_prediction.txt"))


def test_preemption_checkpoint_on_sigterm(workspace, tmp_path):
    """SIGTERM mid-fit -> checkpoint written at the next step boundary,
    clean return, and the run is resumable (SURVEY.md §5.3: the reference
    has no failure handling)."""
    import signal

    cfg = make_cfg(workspace, tmp_path / "pre")
    cfg.train.max_steps = 10**9      # would run forever without preemption
    cfg.train.max_epochs = 10**6
    trainer = Trainer(cfg)
    trainer.install_preemption_handler()

    orig = trainer.train_step
    calls = {"n": 0}

    def step_and_preempt(mb):
        m = orig(mb)
        calls["n"] += 1
        if calls["n"] == 2:
            os.kill(os.getpid(), signal.SIGTERM)
        return m

    trainer.train_step = step_and_preempt
    trainer.fit()                    # returns instead of running forever
    assert calls["n"] == 2

    from conformer_tpu.train import checkpoint as ckpt_mod

    found = ckpt_mod.latest_checkpoint(cfg.train.checkpoint_dir)
    assert found is not None

    trainer2 = Trainer(cfg)
    trainer2.restore(cfg.train.checkpoint_dir)
    assert int(trainer2.state["step"]) == 2


def test_validate_all_decode_modes(workspace, tmp_path):
    """DecodeConfig.mode drives the --eval decode dispatch: every mode
    (greedy/beam RNN-T, greedy/prefix-beam CTC, attention rescoring)
    produces a finite WER over the same dev shard."""
    from conformer_tpu.data.dataset import AsrDataset

    cfg = make_cfg(workspace, tmp_path / "modes")
    cfg.model.decoder_num_layers = 1        # for attention_rescoring
    cfg.model.attention_weight = 0.3
    cfg.decode.max_hyp_len = 16
    cfg.decode.n_steps = 4
    cfg.decode.beam_size = 2
    trainer = Trainer(cfg)

    def ds():
        return AsrDataset(cfg.data, mode="dev", tokenizer=trainer.tokenizer,
                          shard_id=0, num_shards=1)

    for mode in ("greedy_rnnt", "beam_rnnt", "greedy_ctc",
                 "prefix_beam_ctc", "attention_rescoring"):
        cfg.decode.mode = mode
        trainer._decode_fns.clear()
        wer = trainer.validate(ds(), max_batches=1)
        assert np.isfinite(wer) and wer >= 0.0, (mode, wer)

    cfg.decode.mode = "no_such_mode"
    trainer._decode_fns.clear()
    with pytest.raises(ValueError, match="unknown decode.mode"):
        trainer.validate(ds(), max_batches=1)
