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


def test_flagship_tp_train_step_shardings():
    """TP at flagship dims (VERDICT.md next #9): the Conformer-L config
    (d=512, h=8, d_ff=2048, vocab=5002) over a (4, 2) mesh — params AND
    grads must actually shard over "model", and one full grad+Adam step must
    execute. Depth is cut to 4 layers (the [L] axis is compile-O(1) and not
    sharded) to keep CPU memory sane."""
    import dataclasses

    import optax

    from conformer_tpu.config import Config
    from conformer_tpu.train.optimizer import make_optimizer

    cfg = Config.from_json_file("configs/conformer_l.json")
    mcfg = dataclasses.replace(
        cfg.model,
        encoder_num_layers=4,
        use_pallas_rnnt=False,      # CPU test: XLA lattice path
        use_dynamic_chunk=False,
        compute_dtype="float32",
    )
    assert (mcfg.encoder_dim, mcfg.num_heads, mcfg.hidden_dim, mcfg.vocab_size) \
        == (512, 8, 2048, 5002)

    mesh = make_mesh(4, 2)
    params = init_transducer(jax.random.PRNGKey(0), mcfg)
    params = shard_params(params, mesh, model_parallel=True)

    def spec_of(x):
        return x.sharding.spec

    assert spec_of(
        params["encoder"]["layers"]["feed_forward"]["w_1"]["kernel"]
    ) == P(None, None, "model")
    assert spec_of(
        params["encoder"]["layers"]["self_attn"]["linear_q"]["kernel"]
    ) == P(None, None, "model")
    assert spec_of(params["ctc"]["ctc_lo"]["kernel"]) == P(None, "model")
    assert spec_of(params["predictor"]["embed"]["embedding"]) == P("model", None)
    # a sharded leaf must occupy half the memory per device
    w1 = params["encoder"]["layers"]["feed_forward"]["w_1"]["kernel"]
    assert w1.addressable_shards[0].data.shape[-1] == mcfg.hidden_dim // 2

    tx, _ = make_optimizer(cfg.train, params)
    opt_state = tx.init(params)

    b = 4
    batch = shard_batch(
        {
            "feats": jax.random.normal(jax.random.PRNGKey(1), (b, 64, 80)),
            "fl": jnp.full((b,), 64),
            "labels": jax.random.randint(jax.random.PRNGKey(2), (b, 6), 1, 5000),
            "ll": jnp.full((b,), 6),
        },
        mesh,
    )

    @jax.jit
    def train_step(p, opt, batch):
        def loss_fn(q):
            return transducer_forward(
                q, batch["feats"], batch["fl"], batch["labels"], batch["ll"],
                mcfg, deterministic=True,
            )["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, new_opt = tx.update(grads, opt, p)
        return optax.apply_updates(p, updates), new_opt, loss, grads

    new_params, _, loss, grads = train_step(params, opt_state, batch)
    assert np.isfinite(float(loss))
    # GSPMD keeps grads and updated params on the same model sharding
    assert spec_of(
        grads["encoder"]["layers"]["feed_forward"]["w_1"]["kernel"]
    ) == P(None, None, "model")
    assert spec_of(
        new_params["encoder"]["layers"]["feed_forward"]["w_1"]["kernel"]
    ) == P(None, None, "model")


def test_blank_skip_beam_under_dp_tp_mesh():
    """blank_skip_window's while_loop + per-row advance must compile and
    match single-device results under a (data, model) mesh (the sharded
    serving/decode regime of __graft_entry__.dryrun_multichip)."""
    from conformer_tpu.decode.beam_batched import beam_search_batch

    cfg = tiny_test_config().model
    params = init_transducer(jax.random.PRNGKey(0), cfg)
    b = params["joint"]["ffn_out"]["bias"]
    params["joint"]["ffn_out"]["bias"] = b.at[cfg.blank_id].add(4.0)
    enc = jax.random.normal(jax.random.PRNGKey(1), (8, 12, cfg.encoder_dim))
    lens = jnp.full((8,), 12)

    kw = dict(beam_size=2, max_expansions=1, max_hyp_len=8,
              blank_skip_window=4)
    ref = beam_search_batch(params, enc, lens, cfg, **kw)

    mesh = make_mesh(4, 2)
    sp = shard_params(params, mesh, model_parallel=True)
    sb = shard_batch({"enc": enc, "lens": lens}, mesh)

    @jax.jit
    def decode(p, e, l):
        return beam_search_batch(p, e, l, cfg, **kw)

    toks, lens_out, scores = decode(sp, sb["enc"], sb["lens"])
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(ref[2]), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref[0]))
