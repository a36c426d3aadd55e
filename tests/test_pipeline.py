"""Pipeline parallelism: GPipe collective-permute schedule over the stacked
encoder layer axis (parallel/pipeline.py) must match the plain lax.scan
encoder bit-for-bit (deterministic) in both forward and gradients."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conformer_tpu.config import tiny_test_config
from conformer_tpu.models.encoder import encoder_forward, init_encoder
from conformer_tpu.parallel.pipeline import (
    encoder_forward_pipelined,
    make_pipeline_mesh,
    shard_stacked_layers,
)


@pytest.fixture(scope="module")
def setup():
    cfg = dataclasses.replace(
        tiny_test_config().model, encoder_num_layers=4
    )
    params = init_encoder(jax.random.PRNGKey(0), cfg)
    b, t = 8, 64
    feats = jax.random.normal(jax.random.PRNGKey(1), (b, t, cfg.input_dim))
    lens = jnp.array([64, 50, 33, 64, 20, 64, 47, 12], jnp.int32)
    ref, ref_mask = jax.jit(
        lambda p, f, l: encoder_forward(p, f, l, cfg)
    )(params, feats, lens)
    return cfg, params, feats, lens, ref, ref_mask


@pytest.mark.parametrize("data,pipe,m", [(1, 4, 4), (2, 4, 2), (2, 2, 4)])
def test_pipeline_forward_matches_scan(setup, data, pipe, m):
    cfg, params, feats, lens, ref, ref_mask = setup
    mesh = make_pipeline_mesh(data, pipe)
    params = dict(params, layers=shard_stacked_layers(params["layers"], mesh))

    out, mask = jax.jit(
        lambda p, f, l: encoder_forward_pipelined(
            p, f, l, cfg, mesh, num_microbatches=m
        )
    )(params, feats, lens)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(ref_mask))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_pipeline_gradients_match_scan(setup):
    cfg, params, feats, lens, _, _ = setup
    mesh = make_pipeline_mesh(2, 4)

    def loss_scan(p):
        out, mask = encoder_forward(p, feats, lens, cfg)
        return jnp.sum(jnp.where(mask[..., None], out, 0.0) ** 2)

    def loss_pipe(p):
        out, mask = encoder_forward_pipelined(
            p, feats, lens, cfg, mesh, num_microbatches=2
        )
        return jnp.sum(jnp.where(mask[..., None], out, 0.0) ** 2)

    g_ref = jax.jit(jax.grad(loss_scan))(params)
    sharded = dict(params, layers=shard_stacked_layers(params["layers"], mesh))
    g_pipe = jax.jit(jax.grad(loss_pipe))(sharded)

    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pipe = jax.tree.leaves(g_pipe)
    assert len(flat_ref) == len(flat_pipe)
    for (path, a), b in zip(flat_ref, flat_pipe):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_pipeline_full_transducer_loss_matches(setup):
    """The whole training loss (encoder pipelined over 4 stages, predictor /
    joint / CTC data-parallel) matches the plain path."""
    from functools import partial

    from conformer_tpu.models.transducer import (
        init_transducer,
        transducer_forward,
    )
    from conformer_tpu.parallel.pipeline import encoder_forward_pipelined

    cfg, *_ = setup
    params = init_transducer(jax.random.PRNGKey(3), cfg)
    b, t, u = 8, 64, 6
    feats = jax.random.normal(jax.random.PRNGKey(4), (b, t, cfg.input_dim))
    feat_lens = jnp.full((b,), t, jnp.int32)
    labels = jax.random.randint(jax.random.PRNGKey(5), (b, u), 1, cfg.vocab_size - 2)
    label_lens = jnp.full((b,), u, jnp.int32)

    ref = jax.jit(
        lambda p: transducer_forward(
            p, feats, feat_lens, labels, label_lens, cfg, deterministic=True
        )["loss"]
    )(params)

    mesh = make_pipeline_mesh(2, 4)
    enc_fn = partial(encoder_forward_pipelined, mesh=mesh, num_microbatches=2)
    sharded = dict(params)
    sharded["encoder"] = dict(
        params["encoder"],
        layers=shard_stacked_layers(params["encoder"]["layers"], mesh),
    )
    out = jax.jit(
        lambda p: transducer_forward(
            p, feats, feat_lens, labels, label_lens, cfg,
            deterministic=True, encoder_fn=enc_fn,
        )["loss"]
    )(sharded)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)


def test_trainer_pipeline_config_smoke():
    """Trainer with mesh_pipe=2 builds a ("data","pipe") mesh, pipe-shards
    the encoder layer stack, and takes one real optimizer step."""
    import tempfile

    from conformer_tpu.train.loop import Trainer

    cfg = tiny_test_config()
    cfg.model = dataclasses.replace(cfg.model, encoder_num_layers=4)
    cfg.train.mesh_data = 2
    cfg.train.mesh_pipe = 2
    cfg.train.pipeline_microbatches = 2
    with tempfile.TemporaryDirectory() as d:
        cfg.train.checkpoint_dir = d
        tr = Trainer(cfg)
        assert dict(tr.mesh.shape) == {"data": 2, "pipe": 2}
        leaf = jax.tree.leaves(tr.state["params"]["encoder"]["layers"])[0]
        assert {s.data.shape[0] for s in leaf.addressable_shards} == {2}
        b, t, u = 4, 64, 6
        mb = {
            "feats": np.random.RandomState(0)
            .randn(b, t, cfg.model.input_dim)
            .astype(np.float32),
            "feat_lengths": np.full((b,), t, np.int32),
            "labels": np.ones((b, u), np.int32),
            "label_lengths": np.full((b,), u, np.int32),
        }
        metrics = tr.train_step([mb])
        assert np.isfinite(metrics["loss"])
        assert int(tr.state["step"]) == 1


def test_pipeline_layer_params_actually_sharded(setup):
    cfg, params, *_ = setup
    mesh = make_pipeline_mesh(2, 4)
    layers = shard_stacked_layers(params["layers"], mesh)
    leaf = jax.tree.leaves(layers)[0]
    # leading [L]=4 axis split over 4 pipe stages -> 1 layer per shard
    shard_shapes = {s.data.shape for s in leaf.addressable_shards}
    assert all(sh[0] == 1 for sh in shard_shapes), shard_shapes
