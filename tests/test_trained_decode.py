"""Decode evidence on TRAINED weights (VERDICT r2 missing #1).

Every perf/parity number so far used random init (+6 blank bias as an
emission-rate proxy). This suite overfits the tiny recipe to WER 0 on a
4-utterance corpus — the same evidence standard as the reference's published
checkpoint (README.md:128-131), at CI scale — then drives every decode mode
through Trainer.validate on the converged weights and checks the orderings a
real model must satisfy:

  - greedy RNN-T WER == 0 (converged);
  - batched RNN-T beam WER <= greedy WER;
  - CTC prefix-beam WER <= CTC greedy WER;
  - attention rescoring WER <= CTC greedy WER;
  - the trained model's emission density (tokens per encoder frame) is in
    the same regime the +6-blank-bias bench proxy produces, validating the
    proxy (bench.py) against trained behavior.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conformer_tpu.config import tiny_test_config
from conformer_tpu.data import audio
from conformer_tpu.data.dataset import AsrDataset
from conformer_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Overfit the tiny recipe (with the attention-decoder head live so
    rescoring has trained decoders) to greedy WER 0; return (trainer, ds)."""
    d = tmp_path_factory.mktemp("trained_ws")
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

    cfg = tiny_test_config()
    cfg.model.vocab_size = 6
    cfg.model.sos_eos_id = 5
    cfg.model.encoder_num_layers = 1
    cfg.model.hidden_dim = 64
    # train the attention decoders too so rescoring scores trained heads
    cfg.model.attention_weight = 0.2
    cfg.model.reverse_weight = 0.3
    cfg.model.decoder_num_layers = 1
    cfg.model.decoder_hidden_dim = 64
    cfg.data.train_data_list_path = lst
    cfg.data.dev_data_list_path = lst
    cfg.data.test_data_list_path = lst
    cfg.data.vocab_path = vocab_path
    cfg.data.dither = 0.0
    cfg.data.speed_perturb = False
    cfg.data.spec_aug = False
    cfg.data.filter_data = False
    cfg.data.batch_type = "static"
    cfg.data.batch_size = 4
    cfg.data.max_label_len = 8
    cfg.train.checkpoint_dir = str(d / "ckpt")
    cfg.train.num_sanity_val_steps = 0
    cfg.train.log_every = 1000
    cfg.train.val_check_interval = 10**9
    cfg.train.warmup_steps = 5
    cfg.train.lr = 3e-3
    cfg.train.mesh_data = 1
    cfg.train.mesh_model = 1

    trainer = Trainer(cfg)
    ds = AsrDataset(cfg.data, mode="train", tokenizer=trainer.tokenizer,
                    shard_id=0, num_shards=1)
    ds.set_epoch(0)
    batches = list(ds)

    dev = AsrDataset(cfg.data, mode="dev", tokenizer=trainer.tokenizer,
                     shard_id=0, num_shards=1)
    wer = 1.0
    for _ in range(12):                      # up to 240 steps
        for _ in range(20):
            trainer.train_step([batches[0]])
        wer = trainer.validate(dev)
        if wer == 0.0:
            break
    assert wer == 0.0, f"failed to overfit to WER 0 (greedy WER {wer})"
    return trainer, dev


def _wer_with_mode(trainer, dev, mode: str) -> float:
    trainer.cfg.decode.mode = mode
    trainer._decode_fns.clear()               # cache keys ignore the mode
    try:
        return trainer.validate(dev)
    finally:
        trainer.cfg.decode.mode = "greedy_rnnt"
        trainer._decode_fns.clear()


def test_greedy_wer_zero_on_trained(trained):
    trainer, dev = trained
    assert _wer_with_mode(trainer, dev, "greedy_rnnt") == 0.0


def test_beam_wer_leq_greedy_on_trained(trained):
    trainer, dev = trained
    greedy = _wer_with_mode(trainer, dev, "greedy_rnnt")
    beam = _wer_with_mode(trainer, dev, "beam_rnnt")
    assert beam <= greedy, (beam, greedy)


def test_ctc_prefix_beam_and_rescoring_leq_ctc_greedy(trained):
    trainer, dev = trained
    ctc_greedy = _wer_with_mode(trainer, dev, "greedy_ctc")
    prefix = _wer_with_mode(trainer, dev, "prefix_beam_ctc")
    rescored = _wer_with_mode(trainer, dev, "attention_rescoring")
    assert prefix <= ctc_greedy, (prefix, ctc_greedy)
    assert rescored <= ctc_greedy, (rescored, ctc_greedy)


def test_trained_emission_density_matches_bench_proxy(trained):
    """The decode bench biases a random-init joint +6 toward blank so decode
    emits at a trained-model-like rate instead of running to the hypothesis
    cap. Check the proxy's emission density (tokens per encoder frame) lands
    in the same regime as this genuinely trained model's."""
    from conformer_tpu.decode.greedy import greedy_search_batch
    from conformer_tpu.models.transducer import (
        encode, init_transducer,
    )

    trainer, dev = trained
    cfg = trainer.cfg.model
    batch = next(iter(dev))
    feats = jnp.asarray(batch["feats"])
    flens = jnp.asarray(batch["feat_lengths"])

    def density(params):
        enc_out, enc_lens = encode(params, feats, flens, cfg)
        _, lens, _ = greedy_search_batch(
            params, enc_out, enc_lens, cfg, n_steps=16, max_hyp_len=32
        )
        return float(jnp.sum(lens)) / float(jnp.sum(enc_lens))

    d_trained = density(trainer.state["params"])

    proxy = init_transducer(jax.random.PRNGKey(0), cfg)
    bias = proxy["joint"]["ffn_out"]["bias"]
    proxy["joint"]["ffn_out"] = dict(
        proxy["joint"]["ffn_out"], bias=bias.at[cfg.blank_id].add(6.0)
    )
    d_proxy = density(proxy)

    # trained tiny model: ~2-3 tokens over ~11 frames -> ~0.2/frame;
    # the proxy must be in the same sub-linear regime, not at the cap
    assert 0.0 < d_trained < 0.8, d_trained
    assert 0.0 <= d_proxy < 0.8, d_proxy
