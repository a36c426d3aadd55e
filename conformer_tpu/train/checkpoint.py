"""Checkpointing: Orbax save/restore + torch/WeNet checkpoint import.

Reference behavior rebuilt (SURVEY.md §5.4):
  - WER-stamped snapshots `step_{N}-wer_{W}` plus a rolling `last` pointer
    (reference writes "Step:{n}-Valid_WER:{w}.ckpt" + last.ckpt from rank 0,
    src/module.py:89-92);
  - full train-state resume (params + optimizer + step + epoch);
  - WeNet/reference torch state_dict import (model.py:66-69): the name
    mapping below converts the torch parameter tree to ours (the reference's
    tree is deliberately WeNet-shaped).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


# ------------------------------------------------------------------- orbax IO


def save_checkpoint(
    ckpt_dir: str,
    state: Any,
    *,
    step: int,
    wer: float | None = None,
    keep: int = 5,
) -> str:
    """Save {params, opt_state, step, ...} pytree; returns the path.

    Multi-process: EVERY process must call this (orbax synchronizes across
    processes internally; a lone rank-0 call deadlocks on the multihost
    barrier). The array data is written once from the primary host; the
    `last` pointer and GC run on process 0 only. Non-primary processes
    return "".
    """
    primary = jax.process_index() == 0
    os.makedirs(ckpt_dir, exist_ok=True)
    name = f"step_{step}" + (f"-wer_{wer:.6f}" if wer is not None else "")
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    ckptr = ocp.StandardCheckpointer()
    state = jax.tree.map(np.asarray, state)
    ckptr.save(path, state, force=True)
    # Params-only snapshot for serving (restore_params).
    if isinstance(state, dict) and "params" in state:
        ckptr.save(
            os.path.abspath(os.path.join(ckpt_dir, "params_last")),
            state["params"],
            force=True,
        )
    ckptr.wait_until_finished()
    if not primary:
        return ""
    with open(os.path.join(ckpt_dir, "last"), "w") as f:
        f.write(name)
    _gc_checkpoints(ckpt_dir, keep)
    return path


def latest_checkpoint(ckpt_dir: str) -> str | None:
    last = os.path.join(ckpt_dir, "last")
    if os.path.exists(last):
        with open(last) as f:
            name = f.read().strip()
        path = os.path.join(ckpt_dir, name)
        if os.path.exists(path):
            return os.path.abspath(path)
    cands = _list_checkpoints(ckpt_dir)
    return cands[-1][1] if cands else None


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore into the structure of `template` (shapes/dtypes preserved)."""
    ckptr = ocp.StandardCheckpointer()
    target = jax.tree.map(np.asarray, template)
    restored = ckptr.restore(os.path.abspath(path), target)
    return jax.tree.map(jnp.asarray, restored)


def restore_params(path_or_dir: str, params_template: Any) -> Any:
    """Restore a params-only checkpoint for serving.

    A directory resolves to its `params_last` snapshot (written alongside
    every full train-state checkpoint); an explicit path restores directly.
    """
    path = path_or_dir
    if os.path.isdir(path) and os.path.isdir(os.path.join(path, "params_last")):
        path = os.path.join(path, "params_last")
    ckptr = ocp.StandardCheckpointer()
    target = jax.tree.map(np.asarray, params_template)
    restored = ckptr.restore(os.path.abspath(path), target)
    return jax.tree.map(jnp.asarray, restored)


def _list_checkpoints(ckpt_dir: str):
    out = []
    if not os.path.isdir(ckpt_dir):
        return out
    for name in os.listdir(ckpt_dir):
        m = re.match(r"step_(\d+)", name)
        if m:
            out.append((int(m.group(1)), os.path.join(ckpt_dir, name)))
    return sorted(out)


def _gc_checkpoints(ckpt_dir: str, keep: int) -> None:
    import shutil

    cands = _list_checkpoints(ckpt_dir)
    for _, path in cands[:-keep] if keep > 0 else []:
        shutil.rmtree(path, ignore_errors=True)


# --------------------------------------------------- torch / WeNet import


def _torch_state_dict(path: str) -> dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:  # Lightning .ckpt
        sd = ckpt["state_dict"]
        sd = {k.removeprefix("model."): v for k, v in sd.items()}
    else:
        sd = ckpt
    return {k: v.detach().numpy() for k, v in sd.items() if hasattr(v, "detach")}


def import_torch_checkpoint(path: str, params: Any, cfg) -> Any:
    """Map a reference/WeNet torch state_dict onto our params pytree.

    Understands the reference tree (src/executor.py:31-107 wiring): keys like
    encoder.encoders.{i}.self_attn.linear_q.weight,
    predictor.rnn.weight_ih_l{k}, joint.enc_ffn.weight, ctc.ctc_lo.weight.
    Linear weights are transposed ([out,in] -> [in,out]); conv kernels are
    transposed to our HWIO layouts; per-layer tensors are stacked into the
    [L]-leading arrays.
    """
    sd = _torch_state_dict(path)
    p = jax.tree.map(np.asarray, params)
    L = cfg.encoder_num_layers
    missing: list[str] = []

    def take(key, transform=None):
        if key not in sd:
            missing.append(key)
            return None
        v = sd[key]
        return transform(v) if transform else v

    def linear(dst, prefix):
        w = take(prefix + ".weight", lambda v: v.T)
        if w is not None:
            dst["kernel"] = w
        if prefix + ".bias" in sd:
            dst["bias"] = sd[prefix + ".bias"]

    def norm(dst, prefix):
        if prefix + ".weight" in sd:
            dst["scale"] = sd[prefix + ".weight"]
        if prefix + ".bias" in sd:
            dst["bias"] = sd[prefix + ".bias"]
        if prefix + ".running_mean" in sd:
            dst["mean"] = sd[prefix + ".running_mean"]
            dst["var"] = sd[prefix + ".running_var"]

    enc = p["encoder"]
    # subsampling: torch Conv2d weight [O, I, kh, kw] -> [kh, kw, I, O]
    for i, name in [(0, "conv1"), (2, "conv2")]:
        w = take(f"encoder.embed.conv.{i}.weight", lambda v: v.transpose(2, 3, 1, 0))
        if w is not None:
            enc["embed"][name]["kernel"] = w
        b = take(f"encoder.embed.conv.{i}.bias")
        if b is not None:
            enc["embed"][name]["bias"] = b
    linear(enc["embed"]["out"], "encoder.embed.out.0")
    norm(enc["after_norm"], "encoder.after_norm")

    def stack(getter):
        return np.stack([getter(i) for i in range(L)])

    layers = enc["layers"]

    def map_layer_linear(dst_mod, dst_name, src_fmt, has_bias=True):
        key = src_fmt + ".weight"
        if key.format(0) not in sd:
            missing.append(key.format(0))
            return
        layers[dst_mod][dst_name]["kernel"] = stack(
            lambda i: sd[(src_fmt + ".weight").format(i)].T
        )
        if has_bias and (src_fmt + ".bias").format(0) in sd:
            layers[dst_mod][dst_name]["bias"] = stack(
                lambda i: sd[(src_fmt + ".bias").format(i)]
            )

    for ffn in ("feed_forward", "feed_forward_macaron"):
        for w in ("w_1", "w_2"):
            map_layer_linear(ffn, w, f"encoder.encoders.{{}}.{ffn}.{w}")
    for lin in ("linear_q", "linear_k", "linear_v", "linear_out"):
        map_layer_linear("self_attn", lin, f"encoder.encoders.{{}}.self_attn.{lin}")
    if f"encoder.encoders.0.self_attn.linear_pos.weight" in sd:
        map_layer_linear(
            "self_attn", "linear_pos", "encoder.encoders.{}.self_attn.linear_pos",
            has_bias=False,
        )
        layers["self_attn"]["pos_bias_u"] = stack(
            lambda i: sd[f"encoder.encoders.{i}.self_attn.pos_bias_u"]
        )
        layers["self_attn"]["pos_bias_v"] = stack(
            lambda i: sd[f"encoder.encoders.{i}.self_attn.pos_bias_v"]
        )
    # conv module: pointwise Conv1d [O, I, 1] -> [1, I, O]; depthwise
    # [C, 1, K] -> [K, 1, C]
    for name, tr in [
        ("pointwise_conv1", lambda v: v.transpose(2, 1, 0)),
        ("pointwise_conv2", lambda v: v.transpose(2, 1, 0)),
        ("depthwise_conv", lambda v: v.transpose(2, 1, 0)),
    ]:
        key = f"encoder.encoders.0.conv_module.{name}.weight"
        if key in sd:
            layers["conv_module"][name]["kernel"] = stack(
                lambda i: tr(sd[f"encoder.encoders.{i}.conv_module.{name}.weight"])
            )
            bkey = f"encoder.encoders.0.conv_module.{name}.bias"
            if bkey in sd:
                layers["conv_module"][name]["bias"] = stack(
                    lambda i: sd[f"encoder.encoders.{i}.conv_module.{name}.bias"]
                )
    bn = "encoder.encoders.0.conv_module.norm.weight"
    if bn in sd:
        layers["conv_module"]["norm"]["scale"] = stack(
            lambda i: sd[f"encoder.encoders.{i}.conv_module.norm.weight"]
        )
        layers["conv_module"]["norm"]["bias"] = stack(
            lambda i: sd[f"encoder.encoders.{i}.conv_module.norm.bias"]
        )
        if "mean" in layers["conv_module"]["norm"] and (
            f"encoder.encoders.0.conv_module.norm.running_mean" in sd
        ):
            layers["conv_module"]["norm"]["mean"] = stack(
                lambda i: sd[f"encoder.encoders.{i}.conv_module.norm.running_mean"]
            )
            layers["conv_module"]["norm"]["var"] = stack(
                lambda i: sd[f"encoder.encoders.{i}.conv_module.norm.running_var"]
            )
    for ln in ("norm_ff", "norm_ff_macaron", "norm_mha", "norm_conv", "norm_final"):
        key = f"encoder.encoders.0.{ln}.weight"
        if key in sd:
            layers[ln]["scale"] = stack(
                lambda i: sd[f"encoder.encoders.{i}.{ln}.weight"]
            )
            layers[ln]["bias"] = stack(
                lambda i: sd[f"encoder.encoders.{i}.{ln}.bias"]
            )

    # predictor
    if "predictor.embed.weight" in sd:
        p["predictor"]["embed"]["embedding"] = sd["predictor.embed.weight"]
    for k in range(cfg.predictor_num_layers):
        if f"predictor.rnn.weight_ih_l{k}" not in sd:
            continue
        lp = p["predictor"]["rnn"][k]
        lp["w_ih"] = sd[f"predictor.rnn.weight_ih_l{k}"].T
        lp["w_hh"] = sd[f"predictor.rnn.weight_hh_l{k}"].T
        lp["b_ih"] = sd[f"predictor.rnn.bias_ih_l{k}"]
        lp["b_hh"] = sd[f"predictor.rnn.bias_hh_l{k}"]
    linear(p["predictor"]["projection"], "predictor.projection")

    # joint + ctc
    linear(p["joint"]["enc_ffn"], "joint.enc_ffn")
    linear(p["joint"]["pred_ffn"], "joint.pred_ffn")
    linear(p["joint"]["ffn_out"], "joint.ffn_out")
    linear(p["ctc"]["ctc_lo"], "ctc.ctc_lo")

    if missing:
        print(f"[checkpoint import] {len(missing)} keys missing, e.g. {missing[:5]}")
    return jax.tree.map(jnp.asarray, p)


def save_params_npz(path: str, params: Any) -> None:
    """Params pytree -> one portable compressed .npz (for committed test
    fixtures: no orbax directory tree, loads without a template).

    Handles dicts and lists (e.g. the predictor's per-layer `rnn` list);
    list indices are encoded as `name#i` path segments."""
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, vv in node.items():
                walk(f"{prefix}/{k}" if prefix else k, vv)
        elif isinstance(node, (list, tuple)):
            for i, vv in enumerate(node):
                walk(f"{prefix}#{i}", vv)
        else:
            flat[prefix] = np.asarray(node)

    walk("", params)
    assert all(a.dtype != object for a in flat.values()), "unsupported leaf"
    np.savez_compressed(path, **flat)


def load_params_npz(path: str) -> dict:
    """Inverse of save_params_npz: .npz -> nested params pytree."""
    out: dict = {}
    with np.load(path) as z:
        for key in z.files:
            node = out
            parts = []
            for seg in key.split("/"):
                name, *idx = seg.split("#")
                parts.append(name)
                parts.extend(int(i) for i in idx)
            for i, p in enumerate(parts[:-1]):
                nxt_key = parts[i + 1]
                if isinstance(p, int):
                    while len(node) <= p:
                        node.append({} if not isinstance(nxt_key, int) else [])
                    if not isinstance(node[p], (dict, list)):
                        pass
                    node = node[p]
                else:
                    default: Any = [] if isinstance(nxt_key, int) else {}
                    if isinstance(node, dict):
                        node = node.setdefault(p, default)
            last = parts[-1]
            if isinstance(last, int):
                while len(node) <= last:
                    node.append(None)
                node[last] = jnp.asarray(z[key])
            else:
                node[last] = jnp.asarray(z[key])
    return out
