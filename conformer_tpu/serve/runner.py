"""Model runner for serving: load config + checkpoint, preprocess audio,
full-utterance and streaming recognition.

Rebuilds the reference deploy builder (src/deploy.py:24-103 build_model,
:106-146 preprocess/preprocess_stream, src/deploy_common.py Common config) on
our unified Config + Orbax/torch checkpoints. Thread-safe: the params pytree
is read-only; per-stream state lives in StreamingSession values owned by the
caller.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.audio import load_audio, resample
from ..data.tokenizer import Tokenizer, load_vocab
from ..decode.greedy import greedy_search_batch
from ..decode.streaming import (
    StreamingSession,
    new_session,
    session_accept_chunk,
)
from ..models import cmvn as cmvn_mod
from ..models.transducer import encode, init_transducer
from ..ops.fbank import fbank_numpy
from ..train import checkpoint as ckpt_mod


@dataclass
class Recognition:
    text: str
    tokens: list[int]


class ModelRunner:
    def __init__(self, cfg: Config, checkpoint: str | None = None):
        self.cfg = cfg
        cmvn = (
            cmvn_mod.init_cmvn_from_file(cfg.data.cmvn_path)
            if cfg.data.cmvn_path
            else None
        )
        self.params = init_transducer(
            jax.random.PRNGKey(cfg.train.seed), cfg.model, cmvn=cmvn
        )
        if checkpoint:
            if checkpoint.endswith((".pt", ".ckpt", ".pth")):
                # reference/WeNet torch checkpoint (deploy.py:99-100)
                self.params = ckpt_mod.import_torch_checkpoint(
                    checkpoint, self.params, cfg.model
                )
            else:
                self.params = ckpt_mod.restore_params(checkpoint, self.params)
        if cfg.decode.quantize_int8:
            from ..ops.quant import quantize_tree

            # LSTM predictor stays fp (latency-bound recurrence); CMVN is
            # stats, not weights.
            self.params = quantize_tree(
                self.params, skip_keys=("predictor", "cmvn", "joint", "ctc")
            )
        self.tokenizer: Tokenizer | None = None
        if cfg.data.vocab_path:
            self.tokenizer = Tokenizer(
                load_vocab(cfg.data.vocab_path), bpe_model=cfg.data.bpe_model
            )
        self._decode_lock = threading.Lock()

        mcfg = cfg.model
        n_steps = cfg.decode.n_steps
        max_hyp = cfg.decode.max_hyp_len

        @jax.jit
        def _decode(params, feats, feat_lens):
            enc_out, enc_lens = encode(params, feats, feat_lens, mcfg)
            hyps, lens, _ = greedy_search_batch(
                params, enc_out, enc_lens, mcfg,
                n_steps=n_steps, max_hyp_len=max_hyp,
            )
            return hyps, lens

        self._decode_jit = _decode

    # --------------------------------------------------------- preprocessing

    def preprocess_file(self, path: str) -> np.ndarray:
        """File -> fbank [1, T, F] (reference deploy.py:127-146)."""
        wav, sr = load_audio(path)
        return self.preprocess_waveform(wav, sr)

    def preprocess_waveform(self, wav: np.ndarray, sr: int) -> np.ndarray:
        if sr != self.cfg.data.resample_rate:
            wav = resample(wav, sr, self.cfg.data.resample_rate)
        feat = fbank_numpy(
            wav * (1 << 15),
            sample_rate=self.cfg.data.resample_rate,
            num_mel_bins=self.cfg.data.num_mel_bins,
            frame_length=self.cfg.data.frame_length,
            frame_shift=self.cfg.data.frame_shift,
            dither=0.0,
        )
        return feat[None, ...]

    # ----------------------------------------------------------- recognition

    def recognize(self, feats: np.ndarray) -> Recognition:
        """Full-utterance greedy decode (reference §3.4 stack)."""
        feats_j = jnp.asarray(feats, jnp.float32)
        lens = jnp.full((feats_j.shape[0],), feats_j.shape[1], jnp.int32)
        with self._decode_lock:
            hyps, hlens = self._decode_jit(self.params, feats_j, lens)
        ids = np.asarray(hyps)[0, : int(np.asarray(hlens)[0])].tolist()
        return Recognition(text=self._ids_to_text(ids), tokens=ids)

    def recognize_file(self, path: str) -> Recognition:
        return self.recognize(self.preprocess_file(path))

    # ------------------------------------------------------------- streaming

    def new_session(self) -> StreamingSession:
        return new_session(
            self.params, self.cfg.model,
            cache_size=max(
                self.cfg.decode.decoding_chunk_size
                * max(self.cfg.decode.num_decoding_left_chunks, 1),
                64,
            ),
        )

    def accept_chunk(
        self, session: StreamingSession, wav: np.ndarray, sr: int
    ) -> tuple[StreamingSession, Recognition]:
        """Feed raw audio samples; returns (new session, running transcript)."""
        feats = self.preprocess_waveform(wav, sr)
        with self._decode_lock:
            session = session_accept_chunk(
                self.params, session, jnp.asarray(feats), self.cfg.model,
                n_steps=self.cfg.decode.n_steps,
            )
        ids = np.asarray(session.hyps)[0, : int(np.asarray(session.hyp_len)[0])]
        return session, Recognition(text=self._ids_to_text(ids.tolist()),
                                    tokens=ids.tolist())

    def make_scheduler(self, n_slots: int = 16, max_wait_ms: float = 2.0):
        """Micro-batching multi-stream scheduler over this model: N
        concurrent connections share one jitted [n_slots, Tc, F] chunk step
        per tick (serve/scheduler.py; VERDICT r3 next #1)."""
        from .scheduler import StreamScheduler

        return StreamScheduler(
            self.params, self.cfg, n_slots=n_slots, max_wait_ms=max_wait_ms
        )

    def _ids_to_text(self, ids: list[int]) -> str:
        if self.tokenizer is None:
            return " ".join(map(str, ids))
        return self.tokenizer.decode_ids(ids, stop_id=self.cfg.model.sos_eos_id)


