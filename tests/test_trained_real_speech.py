"""Trained-weights decode evidence on REAL SPEECH with the real BPE-5000
vocab (VERDICT r3 next #5).

Round 3's trained-weights evidence ran on 4 synthetic sine waves with a
6-token vocab. This suite overfits the same tiny recipe on the reference's
shipped recordings (samples/*.wav — real formants, multi-second utterances)
with its real vocab.txt id space (5002 BPE pieces): the tokenizer's
GreedyVocabEncoder segments plain text against the sentencepiece-style
vocab, so genuine BPE-5000 ids flow without needing the (unshipped)
.model file. Evidence standard:
/root/reference/README.md:128-131 (the reference's published-WER checkpoint).

Asserted on the converged weights:
  - greedy RNN-T WER == 0;
  - RNN-T beam <= greedy, CTC prefix beam / rescoring <= CTC greedy;
  - streaming-session transcript == offline transcript (trained weights,
    causal conv + static chunk masks: the exactness regime);
  - the micro-batched SessionPool (serving path) reproduces the offline
    transcript too;
  - the +6 blank-bias bench proxy's emission density is re-validated in
    the BPE-5000 regime (VERDICT r3 weak #8).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conformer_tpu.config import tiny_test_config
from conformer_tpu.data.audio import load_audio, save_wav
from conformer_tpu.data.dataset import AsrDataset
from conformer_tpu.train.loop import Trainer

SAMPLES = "/root/reference/samples"
VOCAB = "/root/reference/vocab.txt"
CHUNK = 16

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(SAMPLES) and os.path.exists(VOCAB)),
    reason="reference samples/vocab not available",
)

TRANSCRIPTS = [
    "HIS LIFE",
    "OF COURSE",
    "THE WEATHER IS GOOD",
    "GOOD WORLD",
]
# 0.5 s of real audio per utterance (T'=11 subsampled frames). Longer crops
# let the lattice park emissions diffusely (~0.12/frame across 50+ frames:
# path probability ~1 yet NO frame's argmax is the emit — the classic
# greedy-vs-lattice gap when fixture transcripts have no acoustic anchor).
# At T'=11 driving the NLL to ~0 forces per-frame emit probability past the
# argmax flip, so greedy must recover the labels (same regime as the
# sine-wave fixture in test_trained_decode.py, now on real formants).
CROP_S = 0.5


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    d = tmp_path_factory.mktemp("trained_real")
    entries = []
    for i, text in enumerate(TRANSCRIPTS):
        wav, sr = load_audio(os.path.join(SAMPLES, f"{i}.wav"))
        wav = wav[: int(CROP_S * sr)]
        path = str(d / f"u{i}.wav")
        save_wav(path, wav.astype(np.float32), sr)
        entries.append({"key": f"u{i}", "wav_path": path, "transcript": text})
    lst = str(d / "data.list")
    with open(lst, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")

    cfg = tiny_test_config()
    m = cfg.model
    m.vocab_size = 5002
    m.sos_eos_id = 5001
    m.encoder_dim = 64
    m.encoder_num_layers = 1
    m.num_heads = 2
    m.hidden_dim = 64
    m.kernel_size = 7
    m.predictor_embed_size = 32
    m.predictor_hidden_size = 32
    m.predictor_dim = 32
    m.predictor_num_layers = 1
    m.join_dim = 64
    # streaming==offline exactness regime (causal conv + static chunks)
    m.causal_conv = True
    m.static_chunk_size = CHUNK
    m.use_dynamic_chunk = False
    m.use_dynamic_left_chunk = False
    m.compute_dtype = "float32"
    # attention decoder live so rescoring scores trained heads
    m.attention_weight = 0.2
    m.reverse_weight = 0.3
    m.decoder_num_layers = 1
    m.decoder_hidden_dim = 64

    cfg.data.train_data_list_path = lst
    cfg.data.dev_data_list_path = lst
    cfg.data.test_data_list_path = lst
    cfg.data.vocab_path = VOCAB
    cfg.data.dither = 0.0
    cfg.data.speed_perturb = False
    cfg.data.spec_aug = False
    cfg.data.filter_data = False
    cfg.data.batch_type = "static"
    cfg.data.batch_size = 4
    cfg.data.max_label_len = 8
    cfg.train.checkpoint_dir = str(d / "ckpt")
    cfg.train.num_sanity_val_steps = 0
    cfg.train.log_every = 10**9
    cfg.train.val_check_interval = 10**9
    cfg.train.warmup_steps = 20
    cfg.train.lr = 8e-3
    cfg.train.mesh_data = 1
    cfg.train.mesh_model = 1
    cfg.decode.max_hyp_len = 32
    cfg.decode.n_steps = 8

    trainer = Trainer(cfg)
    ds = AsrDataset(cfg.data, mode="train", tokenizer=trainer.tokenizer,
                    shard_id=0, num_shards=1)
    ds.set_epoch(0)
    batches = list(ds)
    assert len(batches) == 1
    # real BPE-5000 ids in play (not the char fallback's dense low ids)
    labels = np.asarray(batches[0]["labels"])
    assert labels.max() > 4000, labels.max()

    dev = AsrDataset(cfg.data, mode="dev", tokenizer=trainer.tokenizer,
                     shard_id=0, num_shards=1)
    wer = 1.0
    for _ in range(60):                      # up to 1200 steps
        for _ in range(20):
            trainer.train_step([batches[0]])
        wer = trainer.validate(dev)
        if wer == 0.0:
            break
    assert wer == 0.0, f"failed to overfit real speech (greedy WER {wer})"
    return trainer, dev, batches[0]


def _wer_with_mode(trainer, dev, mode: str) -> float:
    trainer.cfg.decode.mode = mode
    trainer._decode_fns.clear()
    try:
        return trainer.validate(dev)
    finally:
        trainer.cfg.decode.mode = "greedy_rnnt"
        trainer._decode_fns.clear()


def test_greedy_wer_zero_on_trained_real_speech(trained):
    trainer, dev, _ = trained
    assert _wer_with_mode(trainer, dev, "greedy_rnnt") == 0.0


def test_decode_mode_orderings_on_trained_real_speech(trained):
    trainer, dev, _ = trained
    greedy = _wer_with_mode(trainer, dev, "greedy_rnnt")
    beam = _wer_with_mode(trainer, dev, "beam_rnnt")
    assert beam <= greedy, (beam, greedy)
    ctc_greedy = _wer_with_mode(trainer, dev, "greedy_ctc")
    prefix = _wer_with_mode(trainer, dev, "prefix_beam_ctc")
    rescored = _wer_with_mode(trainer, dev, "attention_rescoring")
    assert prefix <= ctc_greedy, (prefix, ctc_greedy)
    assert rescored <= ctc_greedy, (rescored, ctc_greedy)


def _offline_greedy(trainer, feats, flens):
    from conformer_tpu.decode.greedy import greedy_search_batch
    from conformer_tpu.models.transducer import encode

    cfg = trainer.cfg.model
    p = trainer.state["params"]
    enc_out, enc_lens = encode(p, feats, flens, cfg)
    hyps, lens, _ = greedy_search_batch(
        p, enc_out, enc_lens, cfg, n_steps=8, max_hyp_len=32
    )
    return [
        np.asarray(hyps)[i, : int(np.asarray(lens)[i])].tolist()
        for i in range(feats.shape[0])
    ]


def _long_feats(trainer):
    """Fbank of LONGER (2.0 s) crops of the same recordings, cut to an
    exact chunk grid: the 0.5 s training crops are shorter than one
    16-frame streaming window, but streaming==offline consistency only
    needs the trained WEIGHTS, not the training-length inputs."""
    from conformer_tpu.models.encoder import chunk_window_params
    from conformer_tpu.ops.fbank import fbank_numpy

    stride, window, _ = chunk_window_params(CHUNK)
    feats_list = []
    for i in range(len(TRANSCRIPTS)):
        wav, sr = load_audio(os.path.join(SAMPLES, f"{i}.wav"))
        f = fbank_numpy(wav[: 2 * sr] * (1 << 15))
        feats_list.append(f)
    t_min = min(f.shape[0] for f in feats_list)
    n_chunks = (t_min - window) // stride + 1
    assert n_chunks >= 2, "need at least 2 streaming chunks"
    t_crop = (n_chunks - 1) * stride + window
    feats = jnp.asarray(np.stack([f[:t_crop] for f in feats_list]))
    flens = jnp.full((feats.shape[0],), t_crop, jnp.int32)
    return feats, flens, n_chunks, stride, window


def test_streaming_equals_offline_on_trained(trained):
    """Chunked streaming session transcript == offline transcript, on
    TRAINED weights over real speech (VERDICT r3 next #5)."""
    from conformer_tpu.decode.streaming import streaming_greedy_search

    trainer, dev, batch = trained
    cfg = trainer.cfg.model
    feats, flens, _, _, _ = _long_feats(trainer)

    offline = _offline_greedy(trainer, feats, flens)
    st_hyps, st_lens = streaming_greedy_search(
        trainer.state["params"], feats, flens, cfg,
        decoding_chunk_size=CHUNK, num_decoding_left_chunks=-1,
        max_cache_size=512, n_steps=8, max_hyp_len=32,
    )
    for i in range(feats.shape[0]):
        got = np.asarray(st_hyps)[i, : int(np.asarray(st_lens)[i])].tolist()
        assert got == offline[i], (i, got, offline[i])


def test_session_pool_equals_offline_on_trained(trained):
    """The micro-batched serving pool reproduces the offline transcript on
    trained weights (ties VERDICT r3 next #1 to #5)."""
    from conformer_tpu.decode.stream_batch import init_pool, pool_step

    trainer, dev, batch = trained
    cfg = trainer.cfg.model
    p = trainer.state["params"]
    feats_j, flens, n_chunks, stride, window = _long_feats(trainer)
    feats = np.asarray(feats_j)
    offline = _offline_greedy(trainer, feats_j, flens)

    bsz = feats.shape[0]
    pool = init_pool(p, cfg, bsz, cache_size=512, max_hyp_len=32)
    for c in range(n_chunks):
        chunk = jnp.asarray(feats[:, c * stride: c * stride + window])
        pool = pool_step(
            p, pool, chunk, jnp.ones((bsz,), bool),
            jnp.full((bsz,), CHUNK, jnp.int32), cfg, n_steps=8,
        )
    for i in range(bsz):
        n = int(np.asarray(pool.hyp_len)[i])
        got = np.asarray(pool.hyps)[i, :n].tolist()
        assert got == offline[i], (i, got, offline[i])


def test_blank_bias_proxy_density_in_bpe5000_regime(trained):
    """The +6.0 blank-bias proxy (bench.py) must produce a trained-like
    emission density in the REAL id space (VERDICT r3 weak #8)."""
    from conformer_tpu.decode.greedy import greedy_search_batch
    from conformer_tpu.models.transducer import encode, init_transducer

    trainer, dev, batch = trained
    cfg = trainer.cfg.model
    feats = jnp.asarray(batch["feats"])
    flens = jnp.asarray(batch["feat_lengths"])

    def density(params):
        enc_out, enc_lens = encode(params, feats, flens, cfg)
        _, lens, _ = greedy_search_batch(
            params, enc_out, enc_lens, cfg, n_steps=8, max_hyp_len=32
        )
        return float(jnp.sum(lens)) / float(jnp.sum(enc_lens))

    d_trained = density(trainer.state["params"])
    proxy = init_transducer(jax.random.PRNGKey(0), cfg)
    bias = proxy["joint"]["ffn_out"]["bias"]
    proxy["joint"]["ffn_out"] = dict(
        proxy["joint"]["ffn_out"], bias=bias.at[cfg.blank_id].add(6.0)
    )
    d_proxy = density(proxy)
    # both sub-linear (not emitting to the cap), same regime
    assert 0.0 < d_trained < 0.8, d_trained
    assert 0.0 <= d_proxy < 0.8, d_proxy
