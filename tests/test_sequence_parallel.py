"""Sequence parallelism (parallel/sequence.py): time-axis-sharded encoder
must match the unsharded forward and gradients, and run inside the full
training loss.

T=260 raw frames -> T'=64 subsampled, divisible by the 4 "seq" shards, so
the sharded path adds no padding and must match exactly. The padding path
(T=256 -> T'=63 -> pad to 64) is compared against the unsharded forward on
the identically padded batch: padding itself perturbs tail frames through
the conv block's post-GLU bias (reference bucket-padding semantics,
src/convolution.py:36), which is not the sharding's doing."""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from conformer_tpu.config import tiny_test_config
from conformer_tpu.models.encoder import encoder_forward, init_encoder
from conformer_tpu.parallel.sequence import (
    encoder_forward_seq,
    make_seq_mesh,
    seq_activation_sharding,
)


def _setup(t=260):
    cfg = tiny_test_config().model
    params = init_encoder(jax.random.PRNGKey(0), cfg)
    b = 4
    feats = jax.random.normal(jax.random.PRNGKey(1), (b, t, cfg.input_dim))
    lens = jnp.array([t, 200, 133, 64], jnp.int32)
    return cfg, params, feats, lens


def test_seq_parallel_forward_matches():
    cfg, params, feats, lens = _setup()
    ref, _ = jax.jit(lambda p: encoder_forward(p, feats, lens, cfg))(params)
    mesh = make_seq_mesh(2, 4)
    out, _ = jax.jit(
        lambda p: encoder_forward_seq(p, feats, lens, cfg, mesh=mesh)
    )(params)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_seq_parallel_pad_path_matches_padded_ref():
    """T'=63 forces a 1-frame pad to reach the 4-shard multiple; the sharded
    result must equal the unsharded forward of the same padded batch."""
    cfg, params, feats, lens = _setup(t=256)
    mesh = make_seq_mesh(2, 4)
    padded = jnp.pad(feats, ((0, 0), (0, 4), (0, 0)))
    ref, _ = jax.jit(lambda p: encoder_forward(p, padded, lens, cfg))(params)
    out, mask = jax.jit(
        lambda p: encoder_forward_seq(p, feats, lens, cfg, mesh=mesh)
    )(params)
    assert out.shape[1] == 63 and mask.shape[1] == 63  # cropped back
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref)[:, :63], rtol=2e-5, atol=2e-5
    )


def test_seq_parallel_activations_sharded_over_time():
    """The constraint actually lands: a jitted probe returning the
    constrained activation shows the time axis split over "seq"."""
    cfg, params, feats, lens = _setup()
    mesh = make_seq_mesh(2, 4)
    sh = seq_activation_sharding(mesh)

    @jax.jit
    def probe(p):
        out, _ = encoder_forward_seq(p, feats, lens, cfg, mesh=mesh)
        return jax.lax.with_sharding_constraint(out, sh)

    out = probe(params)
    shard_t = {s.data.shape[1] for s in out.addressable_shards}
    assert shard_t == {out.shape[1] // 4}, shard_t


def test_seq_parallel_grads_match():
    cfg, params, feats, lens = _setup()
    mesh = make_seq_mesh(2, 4)

    def loss_ref(p):
        out, mask = encoder_forward(p, feats, lens, cfg)
        return jnp.sum(jnp.where(mask[..., None], out, 0.0) ** 2)

    def loss_seq(p):
        out, mask = encoder_forward_seq(p, feats, lens, cfg, mesh=mesh)
        return jnp.sum(jnp.where(mask[..., None], out, 0.0) ** 2)

    g_ref = jax.jit(jax.grad(loss_ref))(params)
    g_seq = jax.jit(jax.grad(loss_seq))(params)
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(g_ref), jax.tree.leaves(g_seq)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_seq_parallel_composes_with_tensor_parallel():
    """3-axis dp+sp+tp mesh {data:2, seq:2, model:2} (VERDICT r2 weak #6):
    params sharded over "model" by the standard rules, activations over
    ("data", "seq") — the composed forward must still match the unsharded
    single-device result, and params must actually be split."""
    from conformer_tpu.parallel.mesh import shard_params

    cfg, params, feats, lens = _setup()
    ref, _ = jax.jit(lambda p: encoder_forward(p, feats, lens, cfg))(params)

    mesh = make_seq_mesh(2, 2, 2)
    assert dict(mesh.shape) == {"data": 2, "seq": 2, "model": 2}
    sp = shard_params({"encoder": params}, mesh, model_parallel=True)["encoder"]
    # the FFN hidden axis really is split over "model"
    w1 = sp["layers"]["feed_forward"]["w_1"]["kernel"]
    shard_h = {s.data.shape[-1] for s in w1.addressable_shards}
    assert shard_h == {w1.shape[-1] // 2}, shard_h

    out, _ = jax.jit(
        lambda p: encoder_forward_seq(p, feats, lens, cfg, mesh=mesh)
    )(sp)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_trainer_mesh_seq_model_smoke(tmp_path):
    """Trainer accepts mesh_seq=2 + mesh_model=2 together (the former assert
    is gone) and takes a finite optimizer step on the 3-axis mesh."""
    from conformer_tpu.train.loop import Trainer

    cfg = tiny_test_config()
    cfg.train.mesh_data = 2
    cfg.train.mesh_seq = 2
    cfg.train.mesh_model = 2
    cfg.train.checkpoint_dir = str(tmp_path)
    tr = Trainer(cfg)
    assert dict(tr.mesh.shape) == {"data": 2, "seq": 2, "model": 2}
    b, t, u = 4, 64, 6
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


def test_seq_parallel_full_loss():
    from conformer_tpu.models.transducer import (
        init_transducer,
        transducer_forward,
    )

    cfg, _, feats, lens = _setup()
    params = init_transducer(jax.random.PRNGKey(2), cfg)
    labels = jax.random.randint(jax.random.PRNGKey(3), (4, 6), 1, 60)
    llens = jnp.full((4,), 6, jnp.int32)
    mesh = make_seq_mesh(2, 4)
    enc_fn = partial(encoder_forward_seq, mesh=mesh)

    ref = jax.jit(
        lambda p: transducer_forward(
            p, feats, lens, labels, llens, cfg, deterministic=True
        )["loss"]
    )(params)
    out = jax.jit(
        lambda p: transducer_forward(
            p, feats, lens, labels, llens, cfg,
            deterministic=True, encoder_fn=enc_fn,
        )["loss"]
    )(params)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)
