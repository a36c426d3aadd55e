"""Pipeline parallelism over the stacked-[L] Conformer layer axis.

The encoder applies its layers with a `lax.scan` over stacked parameters
(models/encoder.py:256-273) — exactly the layout a TPU collective-permute
pipeline wants: shard the leading [L] axis over a "pipe" mesh axis so each
stage holds L/S contiguous layers, split the (per-data-shard) batch into M
microbatches, and run the classic GPipe schedule as a single `lax.scan` of
M + S - 1 ticks inside `shard_map`; activations hop stage→stage+1 with
`lax.ppermute` over ICI each tick. All stages execute the same program
(SPMD); autodiff through ppermute/scan yields the reversed pipeline for the
backward pass, so the same code trains.

This has no reference counterpart (the reference is single-node DDP,
/root/reference/src/executor.py:136-154); it exists so deep encoders
(Conformer-L/XL) scale past what tensor parallelism alone covers, composing
with the ("data", "model") mesh from parallel/mesh.py as
("data", "pipe", "model").
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Any


def make_pipeline_mesh(
    data: int = -1, pipe: int = 2, devices: list | None = None
) -> Mesh:
    """("data", "pipe") mesh; layers shard over "pipe", batch over "data"."""
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        data = n // pipe
    need = data * pipe
    assert need <= n, f"mesh {data}x{pipe} needs {need} devices, have {n}"
    arr = np.asarray(devices[:need]).reshape(data, pipe)
    return Mesh(arr, ("data", "pipe"))


def _stage_program(
    lp_local,
    x_mb,
    consts_mb,
    extras,
    apply_fn: Callable,
    *,
    num_microbatches: int,
    num_stages: int,
    layers_per_stage: int,
    pipe_axis: str,
):
    """Per-stage SPMD body (runs inside shard_map).

    lp_local:  this stage's stacked layer params, leading axis L/S
    x_mb:      [M, mb, T, D] microbatched input (every stage gets a copy;
               only stage 0 reads it)
    consts_mb: pytree of [M, mb, ...] per-example side inputs (masks),
               microbatched like x
    extras:    pytree of batch-independent side inputs (rng key, position
               tables) — passed through shard_map replicated rather than
               captured by closure (closure-captured tracers carry Auto-mesh
               shardings that clash with the Manual context)
    apply_fn:  (layer_params_i, h, consts, extras, global_layer_idx,
               mb_idx) -> h
    """
    stage = jax.lax.axis_index(pipe_axis)
    m = num_microbatches
    s = num_stages

    def run_local_layers(h, consts, mb_idx):
        def body(carry, scan_in):
            lp_i, local_i = scan_in
            g_idx = stage * layers_per_stage + local_i
            return apply_fn(lp_i, carry, consts, extras, g_idx, mb_idx), None

        h, _ = jax.lax.scan(
            body, h, (lp_local, jnp.arange(layers_per_stage))
        )
        return h

    def tick(carry, t):
        state, out = carry
        mb_idx = t - stage  # microbatch this stage works on at tick t
        mb_c = jnp.clip(mb_idx, 0, m - 1)
        inp = jnp.where(stage == 0, x_mb[mb_c], state)
        consts = jax.tree.map(lambda c: c[mb_c], consts_mb)
        y = run_local_layers(inp, consts, mb_c)
        # last stage banks its finished microbatch (when in range)
        valid = (stage == s - 1) & (mb_idx >= 0) & (mb_idx < m)
        out = jnp.where(valid, out.at[mb_c].set(y), out)
        # hand the activation to the next stage for tick t+1
        state = jax.lax.ppermute(
            y, pipe_axis, [(i, (i + 1) % s) for i in range(s)]
        )
        return (state, out), None

    state0 = jnp.zeros_like(x_mb[0])
    out0 = jnp.zeros_like(x_mb)
    (_, out), _ = jax.lax.scan(
        tick, (state0, out0), jnp.arange(m + s - 1)
    )
    # out is correct on the last stage only; replicate it across the pipe
    # axis (psum of a one-hot-by-stage tensor) so out_specs can be
    # pipe-replicated.
    out = jnp.where(stage == s - 1, out, jnp.zeros_like(out))
    return jax.lax.psum(out, pipe_axis)


def pipeline_apply(
    layer_params,
    x: jax.Array,
    consts,
    extras,
    apply_fn: Callable,
    mesh: Mesh,
    *,
    num_microbatches: int,
    num_layers: int,
    pipe_axis: str = "pipe",
    data_axis: str = "data",
) -> jax.Array:
    """Apply stacked layers [L, ...] to x [B, T, D] as a pipeline.

    consts: pytree of per-example side inputs with leading batch axis
    (attention mask, pad mask); sliced into microbatches alongside x.
    extras: pytree of batch-independent side inputs (rng, position tables),
    replicated to every stage. apply_fn(lp_i, h, consts, extras,
    global_layer_idx, mb_idx) -> h applies ONE layer; only true Python
    constants (cfg) may be closed over. Batch (per data shard) must divide
    num_microbatches; L must divide the pipe axis size.
    """
    s = mesh.shape[pipe_axis]
    d = mesh.shape.get(data_axis, 1)
    m = num_microbatches
    assert num_layers % s == 0, f"L={num_layers} not divisible by pipe={s}"
    b = x.shape[0]
    assert b % (d * m) == 0, (
        f"global batch {b} must divide data({d}) x microbatches({m})"
    )
    per_stage = num_layers // s

    has_data = data_axis in mesh.shape and d > 1

    def to_mb(a):
        # [B_local, ...] -> [M, B_local/M, ...] (done inside shard_map)
        return a.reshape(m, a.shape[0] // m, *a.shape[1:])

    def program(lp_local, x_local, consts_local, extras_local):
        x_mb = to_mb(x_local)
        consts_mb = jax.tree.map(to_mb, consts_local)
        out = _stage_program(
            lp_local, x_mb, consts_mb, extras_local, apply_fn,
            num_microbatches=m, num_stages=s,
            layers_per_stage=per_stage, pipe_axis=pipe_axis,
        )
        return out.reshape(x_local.shape)

    dspec = data_axis if has_data else None
    in_specs = (
        jax.tree.map(lambda _: P(pipe_axis), layer_params),
        P(dspec),
        jax.tree.map(lambda _: P(dspec), consts),
        jax.tree.map(lambda _: P(), extras),
    )
    out_specs = P(dspec)
    try:
        fn = shard_map(
            program, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    except TypeError:  # older jax.experimental API
        fn = shard_map(
            program, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )
    return fn(layer_params, x, consts, extras)


def shard_stacked_layers(layer_params, mesh: Mesh, pipe_axis: str = "pipe"):
    """Place stacked [L, ...] layer params with the leading axis sharded
    over the pipe axis (each stage holds its contiguous L/S slice)."""
    sh = NamedSharding(mesh, P(pipe_axis))
    return jax.tree.map(lambda a: jax.device_put(a, sh), layer_params)


# ------------------------------------------------------- encoder wrapper


def encoder_forward_pipelined(
    p: Params,
    feats: jax.Array,
    feat_lengths: jax.Array,
    cfg,
    mesh: Mesh,
    *,
    num_microbatches: int = 2,
    cmvn: Params | None = None,
    rng: jax.Array | None = None,
    deterministic: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """encoder_forward (models/encoder.py:212-275) with the layer stack run
    as a pipeline over mesh axis "pipe". Subsampling / masks / final norm
    stay data-parallel (they are a few % of the FLOPs). Numerically matches
    the scan path when deterministic (dropout draws differ per microbatch
    otherwise, by design — rng folds in layer and microbatch indices)."""
    from ..models import cmvn as cmvn_mod
    from ..models import encoder as enc
    from ..models import layers as L
    from ..models import masks

    if cmvn is not None:
        feats = cmvn_mod.global_cmvn(cmvn, feats)
    feats = feats.astype(jnp.dtype(cfg.compute_dtype))

    if rng is not None:
        rng, mask_rng = jax.random.split(rng)
    else:
        mask_rng = None

    x, pos_emb, rel_positions, pos_ref = enc._embed(p, feats, cfg, 0)
    pad_mask = masks.make_non_pad_mask(
        masks.subsampled_lengths(feat_lengths), x.shape[1]
    )
    attn_mask = masks.make_attn_mask(
        pad_mask,
        use_dynamic_chunk=cfg.use_dynamic_chunk and not deterministic,
        use_dynamic_left_chunk=cfg.use_dynamic_left_chunk,
        decoding_chunk_size=0,
        static_chunk_size=cfg.static_chunk_size,
        num_decoding_left_chunks=-1,
        rng=mask_rng,
    )

    def apply_fn(lp, h, consts, extras, g_idx, mb_idx):
        layer_rng = (
            jax.random.fold_in(jax.random.fold_in(extras["rng"], g_idx), mb_idx)
            if rng is not None
            else None
        )
        y, _, _ = enc.encoder_layer(
            lp, h, consts["attn_mask"], extras["pos_emb"],
            consts["pad_mask"], cfg,
            rel_positions=extras["rel_positions"], pos_ref=extras["pos_ref"],
            rng=layer_rng, deterministic=deterministic,
            use_pallas=cfg.use_pallas_attention,
            use_pallas_conv=cfg.use_pallas_conv and deterministic,
        )
        return y

    if cfg.remat:
        # GPipe banks activations for every in-flight microbatch; remat the
        # per-layer body (like the base encoder's scan, encoder.py) so only
        # layer inputs are saved — the deep configs PP targets need this.
        apply_fn = jax.checkpoint(apply_fn)

    consts = {"attn_mask": attn_mask, "pad_mask": pad_mask}
    extras = {
        "rng": rng,
        "pos_emb": pos_emb,
        "rel_positions": rel_positions,
        "pos_ref": pos_ref,
    }
    x = pipeline_apply(
        p["layers"], x, consts, extras, apply_fn, mesh,
        num_microbatches=num_microbatches,
        num_layers=cfg.encoder_num_layers,
    )
    x = L.layer_norm(p["after_norm"], x)
    return x, pad_mask
