"""Device mesh + sharding specs.

TPU-native replacement for the reference's Lightning DDP/NCCL stack
(src/executor.py:136-154, SURVEY.md §2.2): a ("data", "model") mesh where
  - batches shard over "data" (data parallelism; gradient all-reduce is
    inserted by GSPMD over ICI),
  - the wide matmuls shard over "model" (tensor parallelism): FFN hidden
    (d_ff=2048), attention heads, joint/CTC vocab projections (V=5002), and
    the predictor embedding.
Everything else is replicated. With mesh_model=1 the rules degrade to pure
DP; with one device they are no-ops — the same train step runs everywhere.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1, model: int = 1, devices: list | None = None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        data = n // model
    need = data * model
    assert need <= n, f"mesh {data}x{model} needs {need} devices, have {n}"
    arr = np.asarray(devices[:need]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over "data"."""
    return NamedSharding(mesh, P("data"))


def _spec_for(path: str, ndim: int) -> P:
    """Model-parallel PartitionSpec for a parameter identified by its
    tree path (dot-joined keys; encoder layer params have a leading
    stacked-[L] axis)."""

    def last_axis(spec_tail):
        # build a spec placing spec_tail on the final axis
        return P(*([None] * (ndim - 1) + [spec_tail]))

    def middle(spec_tail):
        return P(*([None] * (ndim - 2) + [spec_tail, None]))

    # FFN: w_1 [.., D, H] shard H; w_2 [.., H, D] shard H (input axis)
    if "feed_forward" in path and "w_1.kernel" in path:
        return last_axis("model")
    if "feed_forward" in path and "w_2.kernel" in path:
        return middle("model")
    if "feed_forward" in path and "w_1.bias" in path:
        return last_axis("model")
    # Attention: q/k/v/pos project D -> heads*dk, shard output (head) axis;
    # out projects back, shard input axis.
    if "self_attn" in path and any(
        f"linear_{x}.kernel" in path for x in ("q", "k", "v", "pos")
    ):
        return last_axis("model")
    if "self_attn" in path and any(
        f"linear_{x}.bias" in path for x in ("q", "k", "v")
    ):
        return last_axis("model")
    if "self_attn" in path and "linear_out.kernel" in path:
        return middle("model")
    # Vocab-sized projections: joint ffn_out [J, V], ctc_lo [D, V]
    if ("ffn_out.kernel" in path or "ctc_lo.kernel" in path) and ndim >= 2:
        return last_axis("model")
    if ("ffn_out.bias" in path or "ctc_lo.bias" in path):
        return last_axis("model")
    # Predictor embedding [V, E]: shard vocab axis
    if "predictor.embed.embedding" in path:
        return P(*(["model"] + [None] * (ndim - 1)))
    return P()


def param_sharding_rules(params: Any, mesh: Mesh) -> Any:
    """NamedSharding tree matching `params` (model sharding over "model")."""

    def path_str(path) -> str:
        parts = []
        for k in path:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
        return ".".join(parts)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    specs = {}
    for path, leaf in flat:
        specs[path] = NamedSharding(mesh, _spec_for(path_str(path), np.ndim(leaf)))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), [specs[p] for p, _ in flat]
    )


def shard_params(params: Any, mesh: Mesh, model_parallel: bool = True) -> Any:
    """Place params on the mesh (replicated, or model-sharded per rules)."""
    if model_parallel and mesh.shape.get("model", 1) > 1:
        shardings = param_sharding_rules(params, mesh)
        return jax.tree.map(
            lambda x, s: jax.device_put(x, s), params, shardings
        )
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), params)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard array leaves over the "data" axis (leading dim).

    Single-process: device_put. Multi-process: each host holds its OWN
    slice of the global batch (the data pipeline shards per host,
    data/dataset.py), so the global array is assembled with
    `jax.make_array_from_process_local_data` — the global batch dimension
    is local_rows x num_processes. All hosts must present the same local
    shape (dataset.py collapses bucketing to one static shape in
    multi-process mode).
    """
    bs = batch_sharding(mesh)
    multiprocess = jax.process_count() > 1

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            if multiprocess:
                return jax.make_array_from_process_local_data(bs, np.asarray(x))
            return jax.device_put(x, bs)
        return x

    return jax.tree.map(put, batch)
