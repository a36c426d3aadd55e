"""Regression tests for round-3 fixes (VERDICT.md r2 weak items + ADVICE.md):
mesh_seq Trainer crash, dropout-key reuse in the second macaron FFN,
DecodeConfig plumb-through for attention_rescoring, int8 fuse_ffn scope,
pipeline remat."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conformer_tpu.config import tiny_test_config
from conformer_tpu.models import encoder as enc_mod
from conformer_tpu.models import layers as layers_mod


class TestTrainerMeshSeq:
    def test_trainer_mesh_seq_config_smoke(self, tmp_path):
        """Trainer with mesh_seq=2 must build a ("data","seq") mesh and take
        a real optimizer step (ADVICE r2 high: shard_stacked_layers used to
        fire on this path and crash on the missing "pipe" axis)."""
        from conformer_tpu.train.loop import Trainer

        cfg = tiny_test_config()
        cfg.train.mesh_data = 4
        cfg.train.mesh_seq = 2
        cfg.train.checkpoint_dir = str(tmp_path)
        tr = Trainer(cfg)
        assert dict(tr.mesh.shape) == {"data": 4, "seq": 2}
        b, t, u = 8, 64, 6
        rs = np.random.RandomState(0)
        mb = {
            "feats": rs.randn(b, t, cfg.model.input_dim).astype(np.float32),
            "feat_lengths": np.full((b,), t, np.int32),
            "labels": np.ones((b, u), np.int32),
            "label_lengths": np.full((b,), u, np.int32),
        }
        metrics = tr.train_step([mb])
        assert np.isfinite(metrics["loss"])
        assert int(tr.state["step"]) == 1


class TestDropoutKeyReuse:
    def test_encoder_layer_dropout_keys_all_distinct(self, monkeypatch):
        """Every dropout site in one conformer layer must draw a distinct
        key (VERDICT r2 weak #5: the final macaron half passed r[5] for
        both the FFN-internal and the residual dropout)."""
        cfg = dataclasses.replace(tiny_test_config().model, dropout=0.5)
        params = jax.tree.map(
            lambda a: a[0],
            enc_mod.init_encoder(jax.random.PRNGKey(0), cfg)["layers"],
        )
        seen = []
        real_dropout = layers_mod.dropout

        def spy(rng, x, rate, deterministic):
            if rng is not None:
                seen.append(tuple(np.asarray(jax.random.key_data(rng)).tolist()))
            return real_dropout(rng, x, rate, deterministic)

        monkeypatch.setattr(layers_mod, "dropout", spy)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, cfg.encoder_dim))
        enc_mod.encoder_layer(
            params, x, None, None, None, cfg,
            rng=jax.random.PRNGKey(7), deterministic=False,
        )
        assert len(seen) >= 6
        assert len(set(seen)) == len(seen), (
            f"dropout keys reused within a layer: {seen}"
        )


class TestRescoringConfigPlumb:
    def test_decode_fn_passes_max_hyp_and_ctc_weight(self, tmp_path, monkeypatch):
        """DecodeConfig.max_hyp_len / rescore_ctc_weight must reach
        attention_rescoring (ADVICE r2 medium: it silently used the
        function defaults, truncating hypotheses at 64)."""
        from conformer_tpu.decode import rescoring as resc_mod
        from conformer_tpu.train.loop import Trainer

        cfg = tiny_test_config()
        cfg.model = dataclasses.replace(
            cfg.model, decoder_num_layers=1, decoder_hidden_dim=64
        )
        cfg.decode.mode = "attention_rescoring"
        cfg.decode.max_hyp_len = 23
        cfg.decode.rescore_ctc_weight = 0.3
        cfg.decode.beam_size = 4
        cfg.train.checkpoint_dir = str(tmp_path)
        tr = Trainer(cfg)

        captured = {}

        def fake_rescoring(p, enc_out, enc_lens, mcfg, **kw):
            captured.update(kw)
            b = enc_out.shape[0]
            hyps = jnp.zeros((b, kw["max_hyp_len"]), jnp.int32)
            return hyps, jnp.full((b,), 2, jnp.int32)

        monkeypatch.setattr(
            resc_mod, "attention_rescoring_batch", fake_rescoring
        )
        b, t = 2, 32
        feats = jnp.zeros((b, t, cfg.model.input_dim), jnp.float32)
        lens = jnp.full((b,), t, jnp.int32)
        hyps, out_lens = tr._decode_fn(feats.shape)(
            tr.state["params"], feats, lens
        )
        assert captured["max_hyp_len"] == 23
        assert captured["ctc_weight"] == pytest.approx(0.3)
        assert captured["top_c"] == cfg.decode.prefix_beam_top_c
        assert hyps.shape == (b, 23)
        assert list(out_lens) == [2, 2]


class TestFuseFfnScope:
    def test_fuse_ffn_quantizes_encoder_not_decoder_contractions(self):
        """fuse_ffn exists only to feed the fused encoder-FFN Pallas kernel;
        decoder FFN contractions (out < in) must keep the expand_only rule
        (ADVICE r2 low: they fell back to the slow generic int8 path)."""
        from conformer_tpu.ops.quant import quantize_tree

        def dense(i, o):
            return {"kernel": jnp.zeros((i, o), jnp.float32),
                    "bias": jnp.zeros((o,), jnp.float32)}

        tree = {
            "encoder": {"layers": {
                "feed_forward": {"w1": dense(64, 256), "w2": dense(256, 64)},
            }},
            "decoder": {"layers": {
                "feed_forward": {"w1": dense(64, 256), "w2": dense(256, 64)},
            }},
        }
        q = quantize_tree(tree, min_dim=64, expand_only=True, fuse_ffn=True)
        # encoder: both matmuls int8 (fused kernel consumes both)
        assert "kernel_q" in q["encoder"]["layers"]["feed_forward"]["w1"]
        assert "kernel_q" in q["encoder"]["layers"]["feed_forward"]["w2"]
        # decoder: expansion quantizes under expand_only, contraction must NOT
        assert "kernel_q" in q["decoder"]["layers"]["feed_forward"]["w1"]
        assert "kernel" in q["decoder"]["layers"]["feed_forward"]["w2"]
        assert "kernel_q" not in q["decoder"]["layers"]["feed_forward"]["w2"]


class TestPipelineRemat:
    def test_pipeline_remat_grads_match(self):
        """cfg.remat through the pipelined encoder must not change the math
        (ADVICE r2 low: the pipelined path ignored remat entirely)."""
        from conformer_tpu.parallel.pipeline import (
            encoder_forward_pipelined,
            make_pipeline_mesh,
            shard_stacked_layers,
        )

        cfg = dataclasses.replace(
            tiny_test_config().model, encoder_num_layers=2
        )
        cfg_remat = dataclasses.replace(cfg, remat=True)
        params = enc_mod.init_encoder(jax.random.PRNGKey(0), cfg)
        mesh = make_pipeline_mesh(1, 2)
        params = dict(
            params, layers=shard_stacked_layers(params["layers"], mesh)
        )
        b, t = 4, 32
        feats = jax.random.normal(
            jax.random.PRNGKey(1), (b, t, cfg.input_dim)
        )
        lens = jnp.full((b,), t, jnp.int32)

        def loss(p, c):
            out, mask = encoder_forward_pipelined(
                p, feats, lens, c, mesh, num_microbatches=2
            )
            return jnp.sum(jnp.where(mask[..., None], out, 0.0) ** 2)

        g0 = jax.jit(jax.grad(lambda p: loss(p, cfg)))(params)
        g1 = jax.jit(jax.grad(lambda p: loss(p, cfg_remat)))(params)
        for a, b_ in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-6
            )
