"""Real-speech end-to-end: decode the reference's shipped recordings with
its real BPE-5000 vocab (VERDICT.md missing #4).

Exercises the full L0->L4 stack on recorded audio — wav load -> resample ->
Kaldi-semantics fbank -> Conformer encoder -> greedy RNN-T decode -> BPE id
-> text — via the serving ModelRunner (reference ars_api.py:7,
src/deploy.py:106-146), plus offline-vs-streaming transcript consistency
under matched chunk masks (causal conv + static chunks + unlimited left
context, the regime where chunked==full is exact).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conformer_tpu.config import Config, ModelConfig
from conformer_tpu.data.audio import load_audio
from conformer_tpu.data.tokenizer import load_vocab
from conformer_tpu.decode.greedy import greedy_search_batch
from conformer_tpu.decode.streaming import streaming_greedy_search
from conformer_tpu.models import encoder as enc_mod
from conformer_tpu.models.transducer import encode, init_transducer

SAMPLES = "/root/reference/samples"
VOCAB = "/root/reference/vocab.txt"

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(SAMPLES) and os.path.exists(VOCAB)),
    reason="reference samples/vocab not available",
)

CHUNK = 16  # subsampled frames per streaming chunk


def _cfg() -> ModelConfig:
    return ModelConfig(
        input_dim=80,
        vocab_size=5002,           # the real vocab.txt id space
        sos_eos_id=5001,
        encoder_dim=128,
        encoder_num_layers=2,
        num_heads=4,
        hidden_dim=256,
        kernel_size=7,
        predictor_embed_size=64,
        predictor_hidden_size=64,
        predictor_dim=64,
        predictor_num_layers=1,
        join_dim=128,
        causal_conv=True,
        static_chunk_size=CHUNK,
        use_dynamic_chunk=False,
        use_dynamic_left_chunk=False,
        compute_dtype="float32",
    )


@pytest.fixture(scope="module")
def params():
    cfg = _cfg()
    p = init_transducer(jax.random.PRNGKey(0), cfg)
    # Blank bias: random-init models emit to the cap; +1.6 with this seed
    # sits just past the blank/emit phase transition, giving a short
    # non-empty transcript (trained-model-like emission rate).
    bias = p["joint"]["ffn_out"]["bias"]
    p["joint"]["ffn_out"] = dict(
        p["joint"]["ffn_out"], bias=bias.at[cfg.blank_id].add(1.6)
    )
    return p


@pytest.fixture(scope="module")
def vocab():
    v = load_vocab(VOCAB)
    assert len(v) == 5002, f"reference vocab should have 5002 ids, got {len(v)}"
    return v


@pytest.fixture(scope="module")
def feats_real():
    """Fbank of samples/0.wav, cropped to an exact streaming chunk grid."""
    from conformer_tpu.ops.fbank import fbank_numpy

    wav, sr = load_audio(os.path.join(SAMPLES, "0.wav"))
    assert sr == 16000
    feat = fbank_numpy(wav * (1 << 15), sample_rate=sr, dither=0.0)
    # per-file normalization standing in for global CMVN (no trained stats
    # here; unnormalized log-mels saturate a random-init encoder)
    feat = (feat - feat.mean(0)) / (feat.std(0) + 1e-5)
    stride, window, _ = enc_mod.chunk_window_params(CHUNK)
    n_chunks = (feat.shape[0] - window) // stride + 1
    t_raw = (n_chunks - 1) * stride + window
    return feat[None, :t_raw, :].astype(np.float32)


class TestOfflineDecode:
    def test_model_runner_full_stack(self, vocab):
        """File -> transcript through the serving ModelRunner with the real
        5002-id vocab (the reference REST stack, §3.4)."""
        from conformer_tpu.serve.runner import ModelRunner

        cfg = Config()
        cfg.model = _cfg()
        cfg.data.vocab_path = VOCAB
        runner = ModelRunner(cfg)
        bias = runner.params["joint"]["ffn_out"]["bias"]
        runner.params["joint"]["ffn_out"] = dict(
            runner.params["joint"]["ffn_out"],
            bias=bias.at[cfg.model.blank_id].add(2.0),
        )
        rec = runner.recognize_file(os.path.join(SAMPLES, "1.wav"))
        assert isinstance(rec.text, str)
        assert all(0 <= t < 5002 for t in rec.tokens)
        # trained-model-like emission rate: short of the 256 cap
        assert len(rec.tokens) < 256


class TestStreamingConsistency:
    def test_offline_matches_streaming_transcript(self, params, feats_real):
        """Full-utterance (static-chunk-masked) decode and chunked streaming
        decode must emit the SAME token sequence on real speech — the
        property live serving relies on (reference §3.3 vs §3.2 paths)."""
        cfg = _cfg()
        feats = jnp.asarray(feats_real)
        lens = jnp.array([feats.shape[1]], jnp.int32)

        enc_out, enc_lens = encode(
            params, feats, lens, cfg,
            decoding_chunk_size=CHUNK, num_decoding_left_chunks=-1,
        )
        off_hyps, off_lens, _ = greedy_search_batch(
            params, enc_out, enc_lens, cfg, n_steps=64, max_hyp_len=256
        )
        offline = np.asarray(off_hyps)[0, : int(off_lens[0])].tolist()

        st_hyps, st_lens = streaming_greedy_search(
            params, feats, lens, cfg,
            decoding_chunk_size=CHUNK, num_decoding_left_chunks=-1,
            max_cache_size=int(enc_lens[0]) + CHUNK,
            n_steps=64, max_hyp_len=256,
        )
        streaming = np.asarray(st_hyps)[0, : int(st_lens[0])].tolist()
        assert offline == streaming, (
            f"offline {offline[:20]} != streaming {streaming[:20]}"
        )
        assert len(offline) > 0

    def test_all_samples_decode_finite(self, params, vocab):
        """Every shipped sample decodes without NaN/cap blowups."""
        from conformer_tpu.data.tokenizer import Tokenizer
        from conformer_tpu.ops.fbank import fbank_numpy

        cfg = _cfg()
        tok = Tokenizer(vocab)
        for name in ("0.wav", "2.wav", "3.wav"):
            wav, sr = load_audio(os.path.join(SAMPLES, name))
            feat = fbank_numpy(wav * (1 << 15), sample_rate=sr, dither=0.0)
            feat = (feat - feat.mean(0)) / (feat.std(0) + 1e-5)
            feats = jnp.asarray(feat[None].astype(np.float32))
            lens = jnp.array([feat.shape[0]], jnp.int32)
            enc_out, enc_lens = encode(params, feats, lens, cfg)
            assert bool(jnp.isfinite(enc_out).all())
            hyps, hlens, _ = greedy_search_batch(
                params, enc_out, enc_lens, cfg, n_steps=64, max_hyp_len=256
            )
            ids = np.asarray(hyps)[0, : int(hlens[0])].tolist()
            text = tok.decode_ids(ids, stop_id=cfg.sos_eos_id)
            assert isinstance(text, str)
            assert all(0 <= t < 5002 for t in ids)
