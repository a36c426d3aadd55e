"""Int8 weight + dynamic-activation quantization for serving.

The reference serves fp32 torch (src/deploy.py:24-103). Here the serving
path can run the big dense layers (FFN, attention projections, joint) as
int8 x int8 -> int32 matmuls, which map to the TPU MXU's double-rate int8
path and halve weight HBM traffic:

  - weights: per-output-channel symmetric int8 (scale = absmax / 127),
    quantized once at load time (`quantize_tree`);
  - activations: per-row dynamic symmetric int8, quantized on the fly
    (XLA fuses the absmax/round into the surrounding elementwise work).

`models/layers.dense` dispatches on the presence of "kernel_q", so a
quantized parameter tree drops into every model entry point unchanged.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


def quantize_dense_params(p: Params) -> Params:
    """{"kernel" [I,O] or [L,I,O] (scan-stacked), "bias"?} ->
    {"kernel_q" int8, "kernel_scale" f32 [O] / [L,O], "bias"?} with
    per-output-channel symmetric scales. Stacked layers slice correctly
    under the encoder's lax.scan (every leaf sliced along axis 0)."""
    w = p["kernel"].astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=-2) / 127.0         # [O] / [L,O]
    scale = jnp.maximum(scale, 1e-12)
    w_q = jnp.clip(
        jnp.round(w / scale[..., None, :]), -127, 127
    ).astype(jnp.int8)
    out: Params = {"kernel_q": w_q, "kernel_scale": scale}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def int8_dense(p: Params, x: jax.Array, use_kernel: bool | None = None) -> jax.Array:
    """y = x @ W + b with W int8 per-channel and x quantized per-row.

    On TPU the quantize+matmul runs as one fused Pallas kernel
    (ops/pallas/quant_kernel.py) — quantizing activations in XLA costs as
    much HBM time as the int8 matmul saves. XLA path kept as oracle/CPU
    fallback."""
    k = x.shape[-1]
    if use_kernel is None:
        # The f32 -> int8 retiling of the activation tile costs O(K) per
        # row; the int8 MXU saving is O(N) per row. Measured on v5e:
        # 1.36x for [256 -> 2048], 0.56x for [2048 -> 256]. Only fuse when
        # the matmul expands.
        n = p["kernel_q"].shape[1]
        use_kernel = (
            jax.devices()[0].platform == "tpu" and k % 128 == 0 and n >= k
        )
    if use_kernel:
        from .pallas.quant_kernel import int8_matmul_dynamic

        y2 = int8_matmul_dynamic(
            x.reshape(-1, k), p["kernel_q"], p["kernel_scale"]
        )
        y = y2.reshape(*x.shape[:-1], y2.shape[-1])
        if "bias" in p:
            y = y + p["bias"].astype(y.dtype)
        return y
    xf = x.astype(jnp.float32)
    x_scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    x_scale = jnp.maximum(x_scale, 1e-12)
    x_q = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
    y32 = jax.lax.dot_general(
        x_q, p["kernel_q"],
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y32.astype(jnp.float32) * x_scale * p["kernel_scale"]
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _is_dense(p: Any) -> bool:
    return (
        isinstance(p, dict)
        and "kernel" in p
        and getattr(p["kernel"], "ndim", 0) in (2, 3)
    )


def quantize_tree(
    params: Params,
    min_dim: int = 64,
    skip_keys: tuple[str, ...] = (),
    expand_only: bool = True,
    fuse_ffn: bool = False,
) -> Params:
    """Walk a parameter pytree, replacing every rank-2 dense whose smaller
    dimension is >= min_dim with int8 params. Subtrees named in skip_keys
    are left untouched (e.g. "predictor" — the LSTM recurrence is latency-
    bound, not matmul-bound). With expand_only (default), contraction
    matmuls (out < in) stay bf16 — int8 loses there to the activation
    retiling cost (see int8_dense). With fuse_ffn, BOTH FFN matmuls
    quantize regardless of expand_only, enabling the fully-fused int8 FFN
    kernel (ops/pallas/ffn_kernel.py) where the contraction's retiling
    happens in VMEM for free."""

    def walk(
        node: Any, name: str, in_ffn: bool = False, in_encoder: bool = False
    ) -> Any:
        if name in skip_keys:
            return node
        if (
            _is_dense(node)
            # rank-3 is ambiguous: scan-stacked dense [L,I,O] vs conv1d
            # [K,I,O] — conv params are excluded by name
            and "conv" not in name
            # rel_features consumes the raw reshaped kernel (attention.py)
            and name != "linear_pos"
            and min(node["kernel"].shape[-2:]) >= min_dim
            and ((fuse_ffn and in_ffn)
                 or not expand_only
                 or node["kernel"].shape[-1] >= 2 * node["kernel"].shape[-2])
        ):
            return quantize_dense_params(node)
        if isinstance(node, dict):
            return {
                # fuse_ffn targets the fused Pallas encoder-FFN kernel only:
                # decoder FFN contractions would fall back to generic
                # int8_dense (measured 0.56x on out<in shapes), so they keep
                # the expand_only rule.
                k: walk(
                    v, k,
                    in_ffn or (in_encoder and "feed_forward" in k),
                    in_encoder or k == "encoder",
                )
                for k, v in node.items()
            }
        if isinstance(node, (list, tuple)):
            return type(node)(
                walk(v, name, in_ffn, in_encoder) for v in node
            )
        return node

    return walk(params, "")
