"""Regression tests for round-2 fixes (VERDICT.md weak items 1, 7, 8, 9):
remat knob plumbing, decoupled per-head dropout RNG, bucket-overflow
handling (no silent data drop)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conformer_tpu.config import Config, tiny_test_config
from conformer_tpu.models import decoder as decoder_mod, masks
from conformer_tpu.models.transducer import init_transducer, transducer_forward


def _batch(cfg, key=0):
    k = jax.random.PRNGKey(key)
    b, t, u = 2, 64, 6
    feats = jax.random.normal(k, (b, t, cfg.input_dim))
    feat_lens = jnp.array([t, t - 16], jnp.int32)
    labels = jax.random.randint(
        jax.random.fold_in(k, 1), (b, u), 1, cfg.vocab_size - 2
    )
    label_lens = jnp.array([u, u - 2], jnp.int32)
    return feats, feat_lens, labels, label_lens


class TestRemat:
    def test_remat_grads_match_no_remat(self):
        """jax.checkpoint must not change the math, only the memory."""
        cfg = tiny_test_config().model
        params = init_transducer(jax.random.PRNGKey(0), cfg)
        feats, feat_lens, labels, label_lens = _batch(cfg)

        def loss(p, mcfg):
            return transducer_forward(
                p, feats, feat_lens, labels, label_lens, mcfg,
                deterministic=True,
            )["loss"]

        cfg_remat = dataclasses.replace(cfg, remat=True)
        g0 = jax.grad(lambda p: loss(p, cfg))(params)
        g1 = jax.grad(lambda p: loss(p, cfg_remat))(params)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    def test_train_config_remat_plumbs_to_model(self, tmp_path):
        """TrainConfig.remat (the CLI-facing knob) must reach the encoder's
        ModelConfig (VERDICT.md weak #1: it used to be a dead knob)."""
        from conformer_tpu.train.loop import Trainer

        cfg = tiny_test_config()
        cfg.train.remat = True
        cfg.train.checkpoint_dir = str(tmp_path)
        trainer = Trainer(cfg)
        assert trainer.cfg.model.remat is True


class TestRngDecoupling:
    def test_attention_decoder_uses_independent_key(self):
        """The CTC head and the attention decoder must draw dropout masks
        from different keys (VERDICT.md weak #8)."""
        cfg = dataclasses.replace(
            tiny_test_config().model,
            attention_weight=0.3,
            decoder_num_layers=1,
            decoder_hidden_dim=64,
            dropout=0.5,
            use_dynamic_chunk=False,
        )
        params = init_transducer(jax.random.PRNGKey(0), cfg)
        feats, feat_lens, labels, label_lens = _batch(cfg)

        rng = jax.random.PRNGKey(42)
        out = transducer_forward(
            params, feats, feat_lens, labels, label_lens, cfg,
            rng=rng, deterministic=False,
        )
        r_enc, r_pred, r_ctc, r_dec = jax.random.split(rng, 4)
        enc_out = out["encoder_out"]
        enc_mask = masks.make_non_pad_mask(
            masks.subsampled_lengths(feat_lens), enc_out.shape[1]
        )
        rnnt_text = jnp.where(labels == cfg.ignore_id, cfg.blank_id, labels)
        loss_dec = decoder_mod.attention_loss(
            params["decoder"], enc_out, enc_mask, rnnt_text, label_lens, cfg,
            rng=r_dec, deterministic=False,
        )
        loss_ctc_key = decoder_mod.attention_loss(
            params["decoder"], enc_out, enc_mask, rnnt_text, label_lens, cfg,
            rng=r_ctc, deterministic=False,
        )
        # forward used r_dec for the decoder head ...
        np.testing.assert_allclose(
            float(out["loss_attn"]), float(loss_dec), rtol=1e-5
        )
        # ... and r_ctc would have produced a different dropout mask.
        assert abs(float(loss_dec) - float(loss_ctc_key)) > 1e-6


class TestBucketOverflow:
    def test_long_utterance_not_dropped(self, capsys):
        from conformer_tpu.data.processor import bucket_batch

        boundaries = (16, 32)
        samples = [
            {"feat": np.zeros((t, 4), np.float32), "label": [1], "key": str(t),
             "txt": ""}
            for t in (10, 100, 20)
        ]
        out = list(bucket_batch(iter(samples), boundaries, max_frames_in_batch=32))
        seen = [s["key"] for batch, _, _ in out for s in batch]
        assert sorted(seen) == ["10", "100", "20"], "overflow sample dropped"
        # overflow batch: singleton, padded to a 128 multiple
        ov = [b for b in out if b[0][0]["key"] == "100"][0]
        assert ov[1] == 128 and ov[2] == 1
        assert "exceeds the last bucket boundary" in capsys.readouterr().err
