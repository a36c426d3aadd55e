"""Int8 serving quantization: numerics, tree walking, end-to-end decode."""

import jax
import jax.numpy as jnp
import numpy as np

from conformer_tpu.config import tiny_test_config
from conformer_tpu.models import layers
from conformer_tpu.models.transducer import encode, init_transducer
from conformer_tpu.decode.greedy import greedy_search_batch
from conformer_tpu.ops.quant import (
    int8_dense,
    quantize_dense_params,
    quantize_tree,
)


def test_int8_dense_close_to_f32():
    rng = jax.random.PRNGKey(0)
    p = layers.init_dense(rng, 128, 256)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 128))
    ref = layers.dense(p, x)
    got = int8_dense(quantize_dense_params(p), x)
    # int8 with per-channel + per-row scales: ~1% relative error budget
    err = jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref))
    assert float(err) < 0.02, float(err)


def test_dense_dispatches_on_quantized_params():
    p = layers.init_dense(jax.random.PRNGKey(0), 64, 64)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64))
    pq = quantize_dense_params(p)
    np.testing.assert_allclose(
        np.asarray(layers.dense(pq, x)), np.asarray(int8_dense(pq, x))
    )


def test_quantize_tree_walks_and_skips():
    cfg = tiny_test_config().model
    params = init_transducer(jax.random.PRNGKey(0), cfg)
    q = quantize_tree(params, min_dim=16, skip_keys=("predictor",))

    leaves = jax.tree.leaves(q)
    assert any(a.dtype == jnp.int8 for a in leaves), "nothing was quantized"

    def has_q(node):
        if isinstance(node, dict):
            return "kernel_q" in node or any(has_q(v) for v in node.values())
        if isinstance(node, (list, tuple)):
            return any(has_q(v) for v in node)
        return False

    assert not has_q(q["predictor"]), "skip_keys subtree was quantized"
    assert has_q(q["encoder"]), "encoder dense layers not quantized"


def test_greedy_decode_runs_with_quantized_params():
    cfg = tiny_test_config().model
    params = init_transducer(jax.random.PRNGKey(0), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 64, cfg.input_dim))
    lens = jnp.array([64, 48])

    def decode(p):
        enc_out, enc_lens = encode(p, feats, lens, cfg)
        hyps, hlens, _ = greedy_search_batch(
            p, enc_out, enc_lens, cfg, n_steps=4, max_hyp_len=32
        )
        return hyps, hlens

    ref_hyps, ref_lens = decode(params)
    q = quantize_tree(params, min_dim=16, skip_keys=("predictor", "cmvn", "joint", "ctc"))
    got_hyps, got_lens = decode(q)
    assert got_hyps.shape == ref_hyps.shape
    assert np.isfinite(np.asarray(got_lens)).all()
    # random-init logits are near-uniform, so token agreement is not a
    # meaningful metric here; shape/finiteness + the dense-level numeric
    # tests above cover correctness.


def test_fused_kernel_matches_xla_path():
    """Pallas fused quantize+matmul (interpret) == XLA int8_dense."""
    rng = jax.random.PRNGKey(3)
    p = layers.init_dense(rng, 128, 384)
    pq = quantize_dense_params(p)
    x = jax.random.normal(jax.random.PRNGKey(4), (3, 40, 128))

    from conformer_tpu.ops.pallas.quant_kernel import int8_matmul_dynamic
    from conformer_tpu.ops.quant import int8_dense as i8d

    ref = i8d(pq, x, use_kernel=False)
    y2 = int8_matmul_dynamic(
        x.reshape(-1, 128), pq["kernel_q"], pq["kernel_scale"],
        tile_m=16, tile_n=128, interpret=True,
    )
    got = y2.reshape(3, 40, -1) + pq["bias"]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
    )
