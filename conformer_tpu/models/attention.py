"""Multi-head self-attention: absolute and relative (Transformer-XL style).

Rebuilds the capability of /root/reference/src/attention.py
(RelativeMultiHeadSelfAttentionModule :34-100, MultiHeadSelfAttentionModule
:130-179) as pure functions. Differences by design (documented in SURVEY.md
"quirks" list):
  - relative attention uses true signed relative distances with the skew
    gather (the reference indexes absolute key positions and has a degenerate
    batched-training path; translation-invariant distances are required for a
    correct streaming cache),
  - masking uses a large-negative fill + post-softmax zeroing (same observable
    semantics as the reference's -inf fill + masked_fill(0.0), NaN-free),
  - softmax runs in fp32 even under bf16 activations.

The streaming KV cache is a fixed-size, right-aligned ring of
(k, v) tensors with a valid-length scalar, so chunked decoding is a
`lax.scan` with static shapes (SURVEY.md §5.7 TPU equivalent).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import layers
from .layers import Params


class AttnCache(NamedTuple):
    """Right-aligned KV cache: the newest frame sits at index size-1."""

    k: jax.Array          # [B, H, C, dk]
    v: jax.Array          # [B, H, C, dk]
    length: jax.Array     # int32 scalar, number of valid trailing slots


def init_attn_cache(
    batch: int, heads: int, cache_size: int, head_dim: int, dtype=jnp.float32
) -> AttnCache:
    return AttnCache(
        k=jnp.zeros((batch, heads, cache_size, head_dim), dtype),
        v=jnp.zeros((batch, heads, cache_size, head_dim), dtype),
        length=jnp.zeros((), jnp.int32),
    )


def init_mhsa(rng, dim: int, num_heads: int, relative: bool) -> Params:
    ks = jax.random.split(rng, 6)
    head_dim = dim // num_heads
    p: Params = {
        "linear_q": layers.init_dense(ks[0], dim, dim),
        "linear_k": layers.init_dense(ks[1], dim, dim),
        "linear_v": layers.init_dense(ks[2], dim, dim),
        "linear_out": layers.init_dense(ks[3], dim, dim),
    }
    if relative:
        p["linear_pos"] = layers.init_dense(ks[4], dim, dim, use_bias=False)
        # xavier_uniform as in reference src/attention.py:52-53
        bound = math.sqrt(6.0 / (num_heads + head_dim))
        ku, kv = jax.random.split(ks[5])
        p["pos_bias_u"] = jax.random.uniform(
            ku, (num_heads, head_dim), jnp.float32, -bound, bound
        )
        p["pos_bias_v"] = jax.random.uniform(
            kv, (num_heads, head_dim), jnp.float32, -bound, bound
        )
    return p


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    b, t, d = x.shape
    return x.reshape(b, t, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    b, h, t, dk = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dk)


def _rel_skew(bd_full: jax.Array, k_len: int) -> jax.Array:
    """[B,H,Tq,Tq+Tk-1] (descending distance) -> [B,H,Tq,Tk].

    Row i needs entries at index (Tq-1-i) + j for j in [0, Tk) — the classic
    Transformer-XL skew, done with the pad+reshape trick (pure reshapes and
    slices, no gather — gathers of this size dominated the encoder forward
    on TPU): pad one zero column -> flatten -> the desired layout appears at
    offset Tq-1 with row stride Tq+Tk-1.
    """
    b, h, q_len, p = bd_full.shape  # p == q_len + k_len - 1
    padded = jnp.pad(bd_full, ((0, 0), (0, 0), (0, 0), (0, 1)))
    flat = padded.reshape(b, h, q_len * (p + 1))
    flat = jax.lax.slice_in_dim(flat, q_len - 1, q_len - 1 + q_len * p, axis=2)
    return flat.reshape(b, h, q_len, p)[..., :k_len]


def _masked_softmax(scores: jax.Array, mask: jax.Array | None) -> jax.Array:
    """Softmax over the key axis with True=attend mask, fp32, NaN-free."""
    sf = scores.astype(jnp.float32)
    if mask is not None:
        big_neg = jnp.asarray(-1e9, jnp.float32)
        sf = jnp.where(mask, sf, big_neg)
    attn = jax.nn.softmax(sf, axis=-1)
    if mask is not None:
        attn = jnp.where(mask, attn, 0.0)
    return attn


def rel_features(
    p: Params,
    q_v: jax.Array,
    q_pos: jax.Array,
    k_pos: jax.Array,
    num_heads: int,
) -> tuple[jax.Array, jax.Array]:
    """(ab [B,H,Tq,D], k_feats [Tk,D]) such that bd = ab @ k_feats^T.

    The factorized form of the relative bias (see rel_bias_decomposed);
    also consumed directly by the Pallas flash-attention kernel.
    """
    from . import embedding

    bsz, h, tq, dk = q_v.shape
    d_model = h * dk
    w = p["linear_pos"]["kernel"].astype(q_v.dtype)        # [D_in, D_out]
    w = w.reshape(d_model, num_heads, dk)
    c = jnp.einsum("bhtd,ihd->bhti", q_v, w, preferred_element_type=q_v.dtype)
    ce, co = c[..., 0::2], c[..., 1::2]                    # [B,H,Tq,K]
    freqs = embedding.rel_freqs(d_model)                   # [K]
    ang_q = q_pos.astype(jnp.float32)[:, None] * freqs[None, :]
    sq = jnp.sin(ang_q).astype(q_v.dtype)[None, None]
    cq = jnp.cos(ang_q).astype(q_v.dtype)[None, None]
    alpha = ce * sq + co * cq
    beta = -ce * cq + co * sq
    ab = jnp.concatenate([alpha, beta], axis=-1)           # [B,H,Tq,2K]
    ang_k = k_pos.astype(jnp.float32)[:, None] * freqs[None, :]
    k_feats = jnp.concatenate(
        [jnp.cos(ang_k), jnp.sin(ang_k)], axis=-1
    ).astype(q_v.dtype)                                    # [Tk,2K]
    return ab, k_feats


def rel_bias_decomposed(
    p: Params,
    q_v: jax.Array,
    q_pos: jax.Array,
    k_pos: jax.Array,
    num_heads: int,
) -> jax.Array:
    """Relative position bias bd[i,j] = q_v[i] . linear_pos(pe(d))_head with
    d = q_pos[i] - k_pos[j], computed WITHOUT the [Tq, Tq+Tk-1] intermediate
    or any gather/skew.

    Because pe(d) is a sinusoid, the angle-addition identities factor the
    bias exactly into two MXU matmuls:
        c      = q_v @ W_pos_head^T                  [B,H,Tq,D]
        alpha  = c_even * sin(w q) + c_odd * cos(w q)
        beta   = -c_even * cos(w q) + c_odd * sin(w q)
        bd     = [alpha; beta] @ [cos(w k); sin(w k)]^T
    Translation-invariant: any consistent (q_pos, k_pos) coordinates work,
    so streaming needs no global offset.
    """
    ab, k_feats = rel_features(p, q_v, q_pos, k_pos, num_heads)
    return jnp.einsum(
        "bhtk,jk->bhtj", ab, k_feats, preferred_element_type=jnp.float32
    )


def mhsa(
    p: Params,
    x_q: jax.Array,
    x_kv: jax.Array,
    attn_mask: jax.Array | None,
    *,
    num_heads: int,
    pos_emb: jax.Array | None = None,
    rel_positions: tuple[jax.Array, jax.Array] | None = None,
    pos_ref: jax.Array | None = None,
    cache: AttnCache | None = None,
    dropout_rate: float = 0.0,
    rng: jax.Array | None = None,
    deterministic: bool = True,
    use_pallas: bool = False,
) -> tuple[jax.Array, AttnCache | None]:
    """Multi-head attention.

    Args:
        x_q: [B, Tq, D]; x_kv: [B, Tkv, D] (== x_q for self-attention).
        attn_mask: bool [B, Tq, Tk_total] (True = attend) or None.
            With a cache, Tk_total = cache_size + Tkv and the caller's mask
            must cover the cache slots (use `cache_valid_mask`).
        rel_positions: (q_pos [Tq], k_pos [Tk_total]) position indices for
            the decomposed relative bias (preferred relative mode).
        pos_emb: [Tq + Tk_total - 1, D] descending-distance table (legacy
            skew-based relative mode); None + rel_positions None = absolute.
        pos_ref: [Bp, P, D] reference-parity position matrix: matrix_bd is
            q_v . linear_pos(pos_ref) exactly as the reference computes it
            (src/attention.py:80-86) — P == Tk_total for the chunk/eval path
            (absolute key positions, no rel-shift) or P == 1 with Bp == B
            for the degenerate batched-training path (pe[batch_index]).
            Overrides rel_positions/pos_emb for the bias term.
        cache: optional fixed-size KV cache; when given, keys/values are
            cache ++ new and the returned cache holds the trailing
            cache_size frames.
    Returns:
        (output [B, Tq, D], new_cache or None)
    """
    d_model = x_q.shape[-1]
    head_dim = d_model // num_heads
    q = _split_heads(layers.dense(p["linear_q"], x_q), num_heads)
    k = _split_heads(layers.dense(p["linear_k"], x_kv), num_heads)
    v = _split_heads(layers.dense(p["linear_v"], x_kv), num_heads)

    new_cache = None
    if cache is not None:
        cache_size = cache.k.shape[2]
        k = jnp.concatenate([cache.k.astype(k.dtype), k], axis=2)
        v = jnp.concatenate([cache.v.astype(v.dtype), v], axis=2)
        new_len = jnp.minimum(cache.length + x_kv.shape[1], cache_size)
        new_cache = AttnCache(
            k=k[:, :, -cache_size:, :] if cache_size > 0 else cache.k,
            v=v[:, :, -cache_size:, :] if cache_size > 0 else cache.v,
            length=new_len,
        )

    scale = 1.0 / math.sqrt(head_dim)
    if pos_ref is not None:
        # Reference-parity bias: bd = q_v @ linear_pos(pos_ref)^T with NO
        # relative shift (reference src/attention.py:80-86).
        u = p["pos_bias_u"].astype(q.dtype)
        v_bias = p["pos_bias_v"].astype(q.dtype)
        q_u = q + u[None, :, None, :]
        q_v = q + v_bias[None, :, None, :]
        ac = jnp.einsum(
            "bhid,bhjd->bhij", q_u, k, preferred_element_type=jnp.float32
        )
        p_proj = layers.dense(p["linear_pos"], pos_ref.astype(x_q.dtype))
        bp, plen, _ = p_proj.shape
        p_proj = p_proj.reshape(bp, plen, num_heads, head_dim)
        if bp == 1:
            bd = jnp.einsum(
                "bhid,phd->bhip", q_v, p_proj[0],
                preferred_element_type=jnp.float32,
            )
        else:
            bd = jnp.einsum(
                "bhid,bphd->bhip", q_v, p_proj,
                preferred_element_type=jnp.float32,
            )
        scores = (ac + bd) * scale  # bd broadcasts over keys when P == 1
    elif rel_positions is not None or pos_emb is not None:
        # Relative: scores = ((q+u)k^T + bd) / sqrt(dk)
        u = p["pos_bias_u"].astype(q.dtype)
        v_bias = p["pos_bias_v"].astype(q.dtype)
        q_u = q + u[None, :, None, :]
        q_v = q + v_bias[None, :, None, :]
        if (
            use_pallas
            and rel_positions is not None
            and attn_mask is not None
            and (deterministic or dropout_rate == 0.0 or rng is not None)
        ):
            # Fused flash-attention kernel: scores/softmax/AV in VMEM.
            # Differentiable (custom VJP), so it also serves the training
            # loss — attention-prob dropout included: the keep mask is drawn
            # from the on-core TPU PRNG per score tile (seeded below), so
            # the reference recipe's attention_dropout=0.1 (train.sh) trains
            # through the kernel without ever materializing the probability
            # matrix. Cached streaming works too: k/v already include
            # the cache here and rel_positions cover the cache slots.
            from ..ops.pallas.attention_kernel import rel_flash_attention

            q_pos, k_pos = rel_positions
            ab, k_feats = rel_features(p, q_v, q_pos, k_pos, num_heads)
            mask_b = (
                jnp.broadcast_to(
                    attn_mask, (q.shape[0],) + attn_mask.shape[1:]
                )
                if attn_mask.shape[0] != q.shape[0]
                else attn_mask
            )
            live_dropout = not deterministic and dropout_rate > 0.0
            out = rel_flash_attention(
                q_u, ab, k, v, k_feats, mask_b, scale=scale,
                dropout_rate=dropout_rate if live_dropout else 0.0,
                dropout_seed=(
                    jax.random.randint(
                        rng, (1,), 0, 2**31 - 1, dtype=jnp.int32
                    )
                    if live_dropout
                    else None
                ),
            )
            out = layers.dense(p["linear_out"], _merge_heads(out))
            return out, new_cache
        ac = jnp.einsum("bhid,bhjd->bhij", q_u, k, preferred_element_type=jnp.float32)
        # When both representations are available (pallas plumbing), the
        # skew path is preferred off-kernel (fastest measured XLA variant).
        if rel_positions is not None and pos_emb is None:
            q_pos, k_pos = rel_positions
            bd = rel_bias_decomposed(p, q_v, q_pos, k_pos, num_heads)
        else:
            p_proj = layers.dense(p["linear_pos"], pos_emb.astype(x_q.dtype))
            p_proj = p_proj.reshape(-1, num_heads, head_dim)  # [P, H, dk]
            # The position-bias term tolerates bf16: keeping bd (and the
            # skew's memory traffic) in the compute dtype nearly halves
            # rel-attention cost; the content term ac stays fp32-accumulated.
            bd_full = jnp.einsum(
                "bhid,phd->bhip", q_v, p_proj, preferred_element_type=q_v.dtype
            )
            bd = _rel_skew(bd_full, k.shape[2]).astype(jnp.float32)
        scores = (ac + bd) * scale
    else:
        scores = (
            jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
            * scale
        )

    mask = attn_mask[:, None, :, :] if attn_mask is not None else None
    attn = _masked_softmax(scores, mask)
    attn = layers.dropout(rng, attn, dropout_rate, deterministic)
    out = jnp.einsum(
        "bhij,bhjd->bhid", attn.astype(v.dtype), v, preferred_element_type=v.dtype
    )
    out = layers.dense(p["linear_out"], _merge_heads(out))
    return out, new_cache


def cache_valid_mask(cache: AttnCache, q_len: int) -> jax.Array:
    """[1, q_len, cache_size + q_len] bool mask covering cache validity.

    Cache slots are right-aligned: slot j is valid iff j >= size - length.
    Chunk (query) positions are causal within the chunk plus full cache view
    is NOT imposed here — this mask only handles validity; combine with a
    chunk mask if needed.
    """
    size = cache.k.shape[2]
    j = jnp.arange(size + q_len)
    length = jnp.reshape(cache.length, (-1, 1))      # scalar or per-row [B]
    valid = jnp.where(j[None, :] < size, j[None, :] >= size - length, True)
    return jnp.broadcast_to(
        valid[:, None, :], (valid.shape[0], q_len, size + q_len)
    )
