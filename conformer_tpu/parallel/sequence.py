"""Sequence parallelism: shard the encoder time axis over a "seq" mesh axis.

For long-form audio (lectures, meetings — minutes of speech per utterance)
the [B, T', D] activations and the [B, T', T'] attention scores outgrow a
chip long before the parameters do. Sequence parallelism splits T' across
devices: FFN / layer-norm / conv work stays local to each time shard, and
GSPMD inserts exactly the collectives attention needs (K/V all-gather over
"seq", riding ICI) at the points the sharding constraints pin down. This is
the GSPMD flavor of sequence parallelism: constraints + compiler-inserted
collectives, not hand-written ring attention.

No reference counterpart (the reference is single-GPU-memory bound,
/root/reference/src/executor.py:136-154). Composes with data parallelism as
a ("data", "seq") mesh; see parallel/pipeline.py for the pipeline axis.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Any


def make_seq_mesh(
    data: int = -1, seq: int = 2, model: int = 1, devices: list | None = None
) -> Mesh:
    """("data", "seq") mesh; batch shards over "data", time over "seq".

    With model > 1 the mesh gains a trailing "model" axis and becomes the
    3-axis dp+sp+tp mesh: parameters shard over "model" via the same
    `mesh._spec_for` rules (shard_params keys on the axis name, not the mesh
    rank), activations over ("data", "seq"), and GSPMD composes the
    collectives — K/V gathers over "seq", matmul reduce-scatters over
    "model", gradient all-reduce over ("data", "seq")."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        data = n // (seq * model)
    need = data * seq * model
    assert need <= n, f"mesh {data}x{seq}x{model} needs {need} devices, have {n}"
    if model > 1:
        arr = np.asarray(devices[:need]).reshape(data, seq, model)
        return Mesh(arr, ("data", "seq", "model"))
    arr = np.asarray(devices[:need]).reshape(data, seq)
    return Mesh(arr, ("data", "seq"))


def seq_activation_sharding(mesh: Mesh) -> NamedSharding:
    """[B, T', D] activations: batch over "data", time over "seq"."""
    return NamedSharding(mesh, P("data", "seq", None))


def encoder_forward_seq(
    p: Params,
    feats: jax.Array,
    feat_lengths: jax.Array,
    cfg,
    *,
    mesh: Mesh,
    cmvn: Params | None = None,
    rng: jax.Array | None = None,
    deterministic: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """encoder_forward with sequence-parallel activation shardings; drop-in
    for transducer_forward's encoder_fn hook (models/transducer.py).

    XLA silently drops a sharding constraint whose axis does not divide the
    dimension, so the raw features are right-padded by whole subsampling
    strides (4 frames per subsampled frame) until T' is a multiple of the
    "seq" axis; the padded tail is invalid in every mask and the output is
    cropped back. Results match the unsharded forward on the same padded
    batch exactly; note that padding itself perturbs the last ~L*kernel/2
    valid frames slightly (the conv block's pointwise bias reaches masked
    frames post-GLU — reference semantics, src/convolution.py:36, identical
    to what the reference's own bucket padding does), so pick utterance
    buckets whose T' divides mesh "seq" to make sharding a pure no-op."""
    import jax.numpy as jnp

    from ..models.encoder import encoder_forward

    nsh = mesh.shape["seq"]
    # static Python arithmetic (feats.shape is static under jit); same
    # formula as masks.subsampled_lengths
    t_sub = ((feats.shape[1] - 1) // 2 - 1) // 2
    pad_sub = (-t_sub) % nsh
    if pad_sub:
        feats = jnp.pad(feats, ((0, 0), (0, 4 * pad_sub), (0, 0)))
    out, mask = encoder_forward(
        p, feats, feat_lengths, cfg,
        cmvn=cmvn, rng=rng, deterministic=deterministic,
        act_sharding=seq_activation_sharding(mesh),
    )
    if pad_sub:
        out, mask = out[:, :t_sub], mask[:, :t_sub]
    return out, mask
