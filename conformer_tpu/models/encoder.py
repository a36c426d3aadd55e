"""Conformer encoder: subsampling + N macaron layers, full-context and
streaming-chunk execution.

Rebuilds /root/reference/src/encoder.py (ConformerEncoder: forward :54-75,
forward_chunk :78-123, forward_chunk_by_chunk :125-153) and
/root/reference/src/encoder_layer.py (ConformerEncoderLayer :9-71), TPU-first:

  - layer parameters are STACKED (leading [L] axis) and applied with
    `lax.scan`, so compile time is O(1) in depth and streaming caches are
    plain [L, ...] arrays carried through the scan;
  - the streaming state is an explicit immutable pytree (EncoderState) with
    STATIC cache sizes, so chunked decoding jits once and runs as a scan
    (reference instead mutates module attributes and grows caches);
  - dynamic-chunk training masks are built from a PRNG key inside jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from . import attention, convolution, embedding, feedforward, layers, masks
from .attention import AttnCache
from .layers import Params


class EncoderState(NamedTuple):
    """Streaming state for chunked execution (SURVEY.md §5.7).

    attn_k/attn_v: [L, B, H, C, dk] right-aligned KV caches
    attn_len:      int32 [B], valid trailing cache slots per row (shared by
                   layers; PER ROW so a slot pool can host streams that
                   joined at different times — decode/stream_batch.py)
    conv_cache:    [L, B, kernel-1, D] post-GLU left context
    offset:        int32 [B], absolute subsampled-frame offset per row
    """

    attn_k: jax.Array
    attn_v: jax.Array
    attn_len: jax.Array
    conv_cache: jax.Array
    offset: jax.Array


# ------------------------------------------------------------------ layer


def init_encoder_layer(rng, cfg: ModelConfig) -> Params:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return {
        "feed_forward_macaron": feedforward.init_ffn(k1, cfg.encoder_dim, cfg.hidden_dim),
        "self_attn": attention.init_mhsa(
            k2, cfg.encoder_dim, cfg.num_heads, cfg.use_relative
        ),
        "conv_module": convolution.init_conv_module(
            k3, cfg.encoder_dim, cfg.kernel_size, cfg.conv_norm
        ),
        "feed_forward": feedforward.init_ffn(k4, cfg.encoder_dim, cfg.hidden_dim),
        "norm_ff_macaron": layers.init_layer_norm(cfg.encoder_dim),
        "norm_mha": layers.init_layer_norm(cfg.encoder_dim),
        "norm_conv": layers.init_layer_norm(cfg.encoder_dim),
        "norm_ff": layers.init_layer_norm(cfg.encoder_dim),
        "norm_final": layers.init_layer_norm(cfg.encoder_dim),
    }


def _ffn_residual(
    norm_p, ffn_p, x, half, cfg, rng_ffn, rng_drop, deterministic
):
    """x + half * FFN(LN(x)) — one macaron half. With int8-quantized FFN
    params (ops/quant.quantize_tree(fuse_ffn=True)) at inference this runs
    as ONE fused Pallas kernel (ops/pallas/ffn_kernel.py): the [*, H]
    hidden never touches HBM."""
    w1, w2 = ffn_p["w_1"], ffn_p["w_2"]
    if (
        deterministic
        and isinstance(w1, dict)
        and "kernel_q" in w1
        and "kernel_q" in w2
    ):
        from ..ops.pallas.ffn_kernel import (
            int8_ffn_fused,
            int8_ffn_reference,
        )

        args = (
            x, norm_p,
            w1["kernel_q"], w1["kernel_scale"], w1["bias"],
            w2["kernel_q"], w2["kernel_scale"], w2["bias"],
        )
        if jax.devices()[0].platform == "tpu":
            return int8_ffn_fused(*args, half=half)
        return int8_ffn_reference(*args, half=half)
    y = layers.layer_norm(norm_p, x)
    y = feedforward.ffn(
        ffn_p, y, dropout_rate=cfg.dropout,
        rng=rng_ffn, deterministic=deterministic,
    )
    return x + half * layers.dropout(rng_drop, y, cfg.dropout, deterministic)


def encoder_layer(
    p: Params,
    x: jax.Array,
    attn_mask: jax.Array | None,
    pos_emb: jax.Array | None,
    pad_mask: jax.Array | None,
    cfg: ModelConfig,
    *,
    rel_positions: tuple[jax.Array, jax.Array] | None = None,
    pos_ref: jax.Array | None = None,
    attn_cache: AttnCache | None = None,
    conv_cache: jax.Array | None = None,
    rng: jax.Array | None = None,
    deterministic: bool = True,
    use_pallas: bool = False,
    use_pallas_conv: bool = False,
) -> tuple[jax.Array, AttnCache | None, jax.Array]:
    """One macaron Conformer layer (reference encoder_layer.py:49-71)."""
    if rng is not None:
        r = jax.random.split(rng, 7)
    else:
        r = [None] * 7
    drop = lambda k, t: layers.dropout(r[k], t, cfg.dropout, deterministic)

    x = _ffn_residual(
        p["norm_ff_macaron"], p["feed_forward_macaron"], x, 0.5, cfg,
        r[0], r[1], deterministic,
    )

    y = layers.layer_norm(p["norm_mha"], x)
    y, new_attn_cache = attention.mhsa(
        p["self_attn"], y, y, attn_mask,
        num_heads=cfg.num_heads, pos_emb=pos_emb, rel_positions=rel_positions,
        pos_ref=pos_ref,
        cache=attn_cache,
        dropout_rate=cfg.attention_dropout, rng=r[2], deterministic=deterministic,
        use_pallas=use_pallas,
    )
    x = x + drop(3, y)

    if (
        use_pallas_conv
        and deterministic
        and conv_cache is None
        and cfg.conv_norm == "layer_norm"
        and not cfg.causal_conv
    ):
        # Fused pre-norm + conv module + residual in one VMEM pass.
        from ..ops.pallas.conv_kernel import conv_block_fused

        lengths = (
            jnp.sum(pad_mask.astype(jnp.int32), axis=1)
            if pad_mask is not None
            else jnp.full((x.shape[0],), x.shape[1], jnp.int32)
        )
        x, new_conv_cache = conv_block_fused(
            x, lengths, p["norm_conv"], p["conv_module"],
            kernel_size=cfg.kernel_size,
        )
    else:
        y = layers.layer_norm(p["norm_conv"], x)
        y, new_conv_cache = convolution.conv_module(
            p["conv_module"], y, pad_mask,
            kernel_size=cfg.kernel_size, norm_type=cfg.conv_norm,
            causal=cfg.causal_conv, cache=conv_cache, deterministic=deterministic,
        )
        x = x + drop(4, y)

    x = _ffn_residual(
        p["norm_ff"], p["feed_forward"], x, 0.5, cfg,
        r[5], r[6], deterministic,
    )
    x = layers.layer_norm(p["norm_final"], x)
    return x, new_attn_cache, new_conv_cache


# ---------------------------------------------------------------- encoder


def init_encoder(rng, cfg: ModelConfig) -> Params:
    k_sub, k_layers = jax.random.split(rng)
    layer_keys = jax.random.split(k_layers, cfg.encoder_num_layers)
    stacked = jax.vmap(lambda k: init_encoder_layer(k, cfg))(layer_keys)
    table = (
        embedding.signed_sinusoid_table(cfg.max_len, cfg.encoder_dim)
        if cfg.use_relative
        else embedding.sinusoid_table(cfg.max_len, cfg.encoder_dim)
    )
    return {
        "embed": convolution.init_subsampling(k_sub, cfg.input_dim, cfg.encoder_dim),
        "layers": stacked,
        "after_norm": layers.init_layer_norm(cfg.encoder_dim),
        "pos_table": table,  # non-trainable; filtered out of the optimizer
    }


def _embed(
    p: Params, feats: jax.Array, cfg: ModelConfig, offset, k_len: int | None = None
) -> tuple[jax.Array, jax.Array | None, tuple | None, jax.Array | None]:
    """Subsample and attach positions.

    Returns (x [B,T',D], pos_emb, rel_positions, pos_ref). Relative mode
    provides either (q_pos, k_pos) indices (rel_mode="decomposed", default),
    the descending-distance table slice (rel_mode="skew"), or the
    reference-parity pos_ref matrix (rel_mode="ref_abs" / "ref_batch" —
    absolute key positions / degenerate pe[batch_index], reproducing
    reference src/attention.py:80-86 for checkpoint parity); absolute mode
    adds positions offset..offset+T' to x.
    """
    x = convolution.subsampling(p["embed"], feats)
    t = x.shape[1]
    if cfg.use_relative:
        k_len = k_len or t
        if cfg.rel_mode == "ref_batch":
            # reference full-context forward: pos_embed = pe[0:B] [B,1,D]
            pos_ref = embedding.abs_pos_vectors(
                jnp.arange(x.shape[0]), cfg.encoder_dim
            )[:, None, :]
            return x, None, None, pos_ref
        if cfg.rel_mode == "ref_abs":
            # reference chunk/eval path at offset 0: pe[0:k_len] [1,Tk,D]
            pos_ref = embedding.abs_pos_vectors(
                jnp.arange(k_len), cfg.encoder_dim
            )[None, :, :]
            return x, None, None, pos_ref
        cache = k_len - t
        rel_positions = (cache + jnp.arange(t), jnp.arange(k_len))
        if cfg.rel_mode == "decomposed" or cfg.use_pallas_attention:
            pos = (
                embedding.relative_pos_embed(p["pos_table"], t, k_len)
                if cfg.rel_mode != "decomposed"
                else None
            )
            return x, pos, rel_positions, None
        pos = embedding.relative_pos_embed(p["pos_table"], t, k_len)
        return x, pos, None, None
    pe = embedding.absolute_pos_embed(p["pos_table"], offset, t).astype(x.dtype)
    return x + pe[None, :, :], None, None, None


def encoder_forward(
    p: Params,
    feats: jax.Array,
    feat_lengths: jax.Array,
    cfg: ModelConfig,
    *,
    cmvn: Params | None = None,
    rng: jax.Array | None = None,
    deterministic: bool = True,
    decoding_chunk_size: int = 0,
    num_decoding_left_chunks: int = -1,
    act_sharding=None,
) -> tuple[jax.Array, jax.Array]:
    """Full-context forward (reference encoder.py:54-75).

    Args:
        feats: [B, T, F] fbank features; feat_lengths: [B] int.
        act_sharding: optional NamedSharding for the [B, T', D] activations
            (e.g. P("data", "seq", None) for sequence parallelism,
            parallel/sequence.py) — constrained before and inside the layer
            scan so GSPMD keeps the time axis sharded through FFN/conv and
            inserts the K/V collectives attention needs.
    Returns:
        (encoder_out [B, T', D], out_pad_mask bool [B, T'] True=valid).
    """
    from . import cmvn as cmvn_mod

    if cmvn is not None:
        feats = cmvn_mod.global_cmvn(cmvn, feats)
    feats = feats.astype(jnp.dtype(cfg.compute_dtype))

    if rng is not None:
        rng, mask_rng = jax.random.split(rng)
    else:
        mask_rng = None

    x, pos_emb, rel_positions, pos_ref = _embed(p, feats, cfg, 0)
    pad_mask = masks.make_non_pad_mask(
        masks.subsampled_lengths(feat_lengths), x.shape[1]
    )
    attn_mask = masks.make_attn_mask(
        pad_mask,
        use_dynamic_chunk=cfg.use_dynamic_chunk and not deterministic,
        use_dynamic_left_chunk=cfg.use_dynamic_left_chunk,
        decoding_chunk_size=decoding_chunk_size,
        static_chunk_size=cfg.static_chunk_size,
        num_decoding_left_chunks=num_decoding_left_chunks,
        rng=mask_rng,
    )

    layer_params = p["layers"]
    if act_sharding is not None:
        x = jax.lax.with_sharding_constraint(x, act_sharding)

    def body(carry, scan_in):
        x, = carry
        lp, idx = scan_in
        layer_rng = jax.random.fold_in(rng, idx) if rng is not None else None
        y, _, _ = encoder_layer(
            lp, x, attn_mask, pos_emb, pad_mask, cfg,
            rel_positions=rel_positions, pos_ref=pos_ref,
            rng=layer_rng, deterministic=deterministic,
            use_pallas=cfg.use_pallas_attention,
            use_pallas_conv=cfg.use_pallas_conv and deterministic,
        )
        if act_sharding is not None:
            y = jax.lax.with_sharding_constraint(y, act_sharding)
        return (y,), None

    idxs = jnp.arange(cfg.encoder_num_layers)
    body_fn = jax.checkpoint(body) if cfg.remat else body
    (x,), _ = jax.lax.scan(body_fn, (x,), (layer_params, idxs))
    x = layers.layer_norm(p["after_norm"], x)
    return x, pad_mask


# ------------------------------------------------------------- streaming


def init_encoder_state(
    cfg: ModelConfig, batch: int, cache_size: int, dtype=None
) -> EncoderState:
    """Fresh streaming state with a static attention cache of `cache_size`
    subsampled frames (use decoding_chunk_size * num_left_chunks; pick a
    finite cap for the reference's required_cache_size=-1 mode)."""
    dtype = dtype or jnp.dtype(cfg.compute_dtype)
    L, H, dk = cfg.encoder_num_layers, cfg.num_heads, cfg.head_dim
    return EncoderState(
        attn_k=jnp.zeros((L, batch, H, cache_size, dk), dtype),
        attn_v=jnp.zeros((L, batch, H, cache_size, dk), dtype),
        attn_len=jnp.zeros((batch,), jnp.int32),
        conv_cache=jnp.zeros((L, batch, cfg.kernel_size - 1, cfg.encoder_dim), dtype),
        offset=jnp.zeros((batch,), jnp.int32),
    )


def encoder_forward_chunk(
    p: Params,
    chunk_feats: jax.Array,
    state: EncoderState,
    cfg: ModelConfig,
    *,
    cmvn: Params | None = None,
) -> tuple[jax.Array, EncoderState]:
    """Incremental forward over one chunk (reference encoder.py:78-123).

    Args:
        chunk_feats: [B, Tc_in, F] raw feature frames for this chunk
            (Tc_in = (chunk-1)*4 + 7 for a chunk of `chunk` subsampled
            frames, reference encoder.py:129-132).
        state: EncoderState from init_encoder_state / previous call.
    Returns:
        (chunk_out [B, Tc, D], new state). Queries attend to all valid cache
        slots plus the whole chunk (the reference passes an empty mask in
        forward_chunk, i.e. non-causal within the chunk).
    """
    from . import cmvn as cmvn_mod

    if cmvn is not None:
        chunk_feats = cmvn_mod.global_cmvn(cmvn, chunk_feats)
    chunk_feats = chunk_feats.astype(jnp.dtype(cfg.compute_dtype))

    cache_size = state.attn_k.shape[3]
    x = convolution.subsampling(p["embed"], chunk_feats)
    q_len = x.shape[1]
    k_len = cache_size + q_len

    rel_positions = None
    pos_emb = None
    pos_ref = None
    bsz = x.shape[0]
    if cfg.use_relative:
        if cfg.rel_mode in ("ref_abs", "ref_batch"):
            # Reference forward_chunk parity (encoder.py:94-100): key
            # positions pe[offset - cache_size + j] for j in [0, k_len),
            # per row (offsets differ across a slot pool).
            pos_idx = (
                state.offset[:, None] - cache_size + jnp.arange(k_len)[None, :]
            )                                                     # [B, k_len]
            pos_ref = embedding.abs_pos_vectors(
                pos_idx.reshape(-1), cfg.encoder_dim
            ).reshape(bsz, k_len, cfg.encoder_dim)
        elif cfg.rel_mode == "decomposed" or cfg.use_pallas_attention:
            rel_positions = (cache_size + jnp.arange(q_len), jnp.arange(k_len))
        else:
            pos_emb = embedding.relative_pos_embed(p["pos_table"], q_len, k_len)
    else:
        # per-row absolute positions offset[b]..offset[b]+q_len
        idx = jnp.clip(
            state.offset[:, None] + jnp.arange(q_len)[None, :],
            0, p["pos_table"].shape[0] - 1,
        )
        pe = jnp.take(p["pos_table"], idx, axis=0)                # [B, q, D]
        x = x + pe.astype(x.dtype)

    # True=attend: valid cache slots (right-aligned, per row) + whole chunk.
    j = jnp.arange(k_len)
    key_valid = jnp.where(
        j[None, :] < cache_size,
        j[None, :] >= cache_size - state.attn_len[:, None],
        True,
    )                                                             # [B, k_len]
    attn_mask = jnp.broadcast_to(
        key_valid[:, None, :], (bsz, q_len, k_len)
    )

    def body(carry, scan_in):
        (x,) = carry
        lp, k_cache, v_cache, c_cache = scan_in
        cache = AttnCache(k=k_cache, v=v_cache, length=state.attn_len)
        y, new_attn, new_conv = encoder_layer(
            lp, x, attn_mask, pos_emb, None, cfg,
            rel_positions=rel_positions, pos_ref=pos_ref,
            attn_cache=cache, conv_cache=c_cache, deterministic=True,
            use_pallas=cfg.use_pallas_attention,
        )
        return (y,), (new_attn.k, new_attn.v, new_conv)

    (x,), (new_k, new_v, new_conv) = jax.lax.scan(
        body, (x,), (p["layers"], state.attn_k, state.attn_v, state.conv_cache)
    )
    x = layers.layer_norm(p["after_norm"], x)
    new_state = EncoderState(
        attn_k=new_k,
        attn_v=new_v,
        attn_len=jnp.minimum(state.attn_len + q_len, cache_size),
        conv_cache=new_conv,
        offset=state.offset + q_len,
    )
    return x, new_state


def chunk_window_params(decoding_chunk_size: int) -> tuple[int, int, int]:
    """(stride, window, context) in raw frames for a given subsampled chunk
    size: subsampling x4, context 7 (reference encoder.py:129-132)."""
    subsampling_rate, context = 4, 7
    stride = subsampling_rate * decoding_chunk_size
    window = (decoding_chunk_size - 1) * subsampling_rate + context
    return stride, window, context


def encoder_forward_chunk_by_chunk(
    p: Params,
    feats: jax.Array,
    cfg: ModelConfig,
    *,
    decoding_chunk_size: int,
    num_decoding_left_chunks: int = -1,
    cmvn: Params | None = None,
    max_cache_size: int = 512,
) -> tuple[jax.Array, jax.Array]:
    """Python-loop chunked forward over a whole utterance (B=1 style),
    mirroring reference encoder.py:125-153. For the jitted batched version
    see decode/streaming.py.
    """
    stride, window, context = chunk_window_params(decoding_chunk_size)
    num_frames = feats.shape[1]
    if num_decoding_left_chunks >= 0:
        cache_size = decoding_chunk_size * num_decoding_left_chunks
    else:
        cache_size = max_cache_size
    state = init_encoder_state(cfg, feats.shape[0], cache_size)
    outs = []
    for cur in range(0, num_frames - context + 1, stride):
        end = min(cur + window, num_frames)
        chunk = feats[:, cur:end, :]
        y, state = encoder_forward_chunk(p, chunk, state, cfg, cmvn=cmvn)
        outs.append(y)
    out = jnp.concatenate(outs, axis=1)
    pad_mask = jnp.ones((feats.shape[0], out.shape[1]), bool)
    return out, pad_mask
