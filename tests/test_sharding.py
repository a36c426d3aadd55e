"""Mesh + sharding on the 8-device virtual CPU mesh (SURVEY.md §4d)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from conformer_tpu.config import tiny_test_config
from conformer_tpu.models.transducer import init_transducer, transducer_forward
from conformer_tpu.parallel import (
    make_mesh,
    param_sharding_rules,
    shard_batch,
    shard_params,
)


def test_mesh_shapes():
    assert jax.device_count() == 8
    mesh = make_mesh(4, 2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh_dp = make_mesh(-1, 1)
    assert mesh_dp.shape == {"data": 8, "model": 1}


def test_param_sharding_rules_cover_big_matmuls():
    cfg = tiny_test_config().model
    params = init_transducer(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(4, 2)
    rules = param_sharding_rules(params, mesh)
    ffn_w1 = rules["encoder"]["layers"]["feed_forward"]["w_1"]["kernel"]
    assert ffn_w1.spec == P(None, None, "model")
    ffn_w2 = rules["encoder"]["layers"]["feed_forward"]["w_2"]["kernel"]
    assert ffn_w2.spec == P(None, "model", None)
    vocab_out = rules["joint"]["ffn_out"]["kernel"]
    assert vocab_out.spec == P(None, "model")
    pos = rules["encoder"]["pos_table"]
    assert pos.spec == P()


def test_dp_tp_forward_matches_single_device():
    cfg = tiny_test_config().model
    params = init_transducer(jax.random.PRNGKey(0), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (8, 64, 80))
    feat_lens = jnp.full((8,), 64)
    labels = jax.random.randint(jax.random.PRNGKey(2), (8, 5), 1, 60)
    label_lens = jnp.full((8,), 5)

    ref = transducer_forward(
        params, feats, feat_lens, labels, label_lens, cfg, deterministic=True
    )["loss"]

    mesh = make_mesh(4, 2)
    sp = shard_params(params, mesh, model_parallel=True)
    batch = shard_batch(
        {"feats": feats, "fl": feat_lens, "labels": labels, "ll": label_lens}, mesh
    )

    @jax.jit
    def loss_fn(p, f, fl, l, ll):
        return transducer_forward(p, f, fl, l, ll, cfg, deterministic=True)["loss"]

    got = loss_fn(sp, batch["feats"], batch["fl"], batch["labels"], batch["ll"])
    np.testing.assert_allclose(float(got), float(ref), rtol=5e-4)


def test_grad_allreduce_under_dp():
    """Gradients under the data mesh equal single-device gradients."""
    cfg = tiny_test_config().model
    params = init_transducer(jax.random.PRNGKey(0), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (8, 48, 80))
    feat_lens = jnp.full((8,), 48)
    labels = jax.random.randint(jax.random.PRNGKey(2), (8, 4), 1, 60)
    label_lens = jnp.full((8,), 4)

    def loss_fn(p, f, fl, l, ll):
        return transducer_forward(p, f, fl, l, ll, cfg, deterministic=True)["loss"]

    g_ref = jax.grad(loss_fn)(params, feats, feat_lens, labels, label_lens)

    mesh = make_mesh(8, 1)
    sp = shard_params(params, mesh)
    b = shard_batch({"f": feats, "fl": feat_lens, "l": labels, "ll": label_lens}, mesh)
    g_dp = jax.jit(jax.grad(loss_fn))(sp, b["f"], b["fl"], b["l"], b["ll"])

    ref_leaf = np.asarray(g_ref["joint"]["ffn_out"]["kernel"])
    dp_leaf = np.asarray(g_dp["joint"]["ffn_out"]["kernel"])
    np.testing.assert_allclose(dp_leaf, ref_leaf, rtol=1e-4, atol=1e-5)


def test_beam_decode_under_dp_tp_mesh():
    """Batched beam search under a (data, model) mesh: the vocab-sharded
    joint logits force GSPMD to exchange lattice/beam state via collectives
    during decode (BASELINE config #5); results must match single-device."""
    from conformer_tpu.decode.beam_batched import beam_search_batch

    cfg = tiny_test_config().model
    params = init_transducer(jax.random.PRNGKey(0), cfg)
    enc = jax.random.normal(jax.random.PRNGKey(1), (8, 6, cfg.encoder_dim))
    lens = jnp.full((8,), 6)

    ref_toks, ref_lens, ref_scores = beam_search_batch(
        params, enc, lens, cfg, beam_size=2, max_expansions=1, max_hyp_len=8
    )

    mesh = make_mesh(4, 2)
    sp = shard_params(params, mesh, model_parallel=True)
    b = shard_batch({"enc": enc, "lens": lens}, mesh)

    @jax.jit
    def decode(p, e, l):
        return beam_search_batch(
            p, e, l, cfg, beam_size=2, max_expansions=1, max_hyp_len=8
        )

    toks, lens_out, scores = decode(sp, b["enc"], b["lens"])
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(ref_scores), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref_toks))
