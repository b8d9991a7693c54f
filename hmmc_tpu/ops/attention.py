"""Attention ops.

The sequence lengths in this framework are tiny by LLM standards (32-77 text
tokens, 50-197 ViT patches, 12-48 frames — see SURVEY §5), so the default
path is a plain XLA dot-product attention: XLA fuses the softmax chain and
keeps the matmuls on the MXU, and at these sizes a hand-rolled flash kernel
has nothing to tile. A Pallas fused kernel is provided in
:mod:`hmmc_tpu.ops.pallas_attention` for the long-frame/ViT-B16 stretch
configs and is selected via ``TaskConfig.use_pallas_attention``.

Semantics match ``torch.nn.MultiheadAttention`` as used by the reference
(module_clip.py:231-257): scaled dot product, optional additive mask,
softmax over keys. Softmax statistics are computed in fp32 regardless of the
compute dtype (bf16-safe).
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
from jax import lax

# Experimental attention layout selector (perf A/B on the real chip —
# see docs/design.md "attention data formatting"):
#   inplace (default): one packed [B·L, 3D] qkv GEMM, head axis kept in
#       place, einsums over [B, L, H, Dh].
#   batched_head: the head split is folded into the PROJECTION GEMM —
#       a batched-over-heads einsum emits q/k/v already in [B, H, L, Dh],
#       so no head-split layout copy can exist downstream. The weight is
#       viewed [D, 3, H, Dh] (free at trace time; the per-layer operand
#       re-layout is ~3.5 MB, vs the ~2.3 GB/step of materialized
#       head-layout copies the op profile attributes to the inplace path).
_ATTN_LAYOUT = os.environ.get("HMMC_ATTN_LAYOUT", "inplace")


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """q,k,v: [B, H, L, Dh]; mask: additive, broadcastable to [B, H, L, L]."""
    depth = q.shape[-1]
    scale = depth ** -0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)
    weights = jnp.exp(logits - lax.stop_gradient(
        jnp.max(logits, axis=-1, keepdims=True)))
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    weights = weights.astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def multi_head_attention(
    x: jnp.ndarray,
    in_proj_kernel: jnp.ndarray,
    in_proj_bias: jnp.ndarray,
    out_kernel: jnp.ndarray,
    out_bias: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    use_pallas: bool = False,
    causal: bool = False,
    return_weights: bool = False,
) -> jnp.ndarray:
    """Self-attention with a packed qkv projection.

    x: [B, L, D]. in_proj_kernel: [D, 3D] ([in, out] layout; the torch
    checkpoint's in_proj_weight [3D, D] is transposed on import).
    mask: additive, broadcastable to [B, H, L, L]. ``causal`` flags the
    causal pattern statically so the Pallas kernel can apply it in-kernel
    (the XLA path keeps using ``mask``, which the caller builds to include
    causality). ``return_weights`` additionally returns the fp32 softmax
    probabilities [B, H, L, L] (visualization/introspection path — the
    Pallas kernel never materializes them, so it requires the XLA path).
    """
    b, l, d = x.shape
    head_dim = d // num_heads

    if _ATTN_LAYOUT == "batched_head" and not use_pallas:
        return _mha_batched_head(x, in_proj_kernel, in_proj_bias,
                                 out_kernel, out_bias, num_heads, mask,
                                 return_weights)

    qkv = jnp.einsum("bld,de->ble", x, in_proj_kernel.astype(x.dtype))
    qkv = qkv + in_proj_bias.astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    if use_pallas:
        if return_weights:
            raise ValueError(
                "return_weights requires the XLA attention path — the "
                "fused Pallas kernel never materializes the probabilities")

        def heads(t):
            return t.reshape(b, l, num_heads, head_dim).transpose(0, 2, 1, 3)

        from hmmc_tpu.ops.pallas_attention import flash_attention

        out = flash_attention(heads(q), heads(k), heads(v),
                              None if causal else mask, causal=causal)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
        out = jnp.einsum("bld,de->ble", out, out_kernel.astype(x.dtype))
        return out + out_bias.astype(x.dtype)

    # XLA path: keep the head axis in place ([B, L, H, Dh], free reshape
    # from the row-major projection output) instead of transposing to
    # [B, H, L, Dh] — the materialized layout copies around the attention
    # einsums measured ~2.3 GB/step on the ViT-B/32 train step; einsums
    # over the native layout let XLA fold the layout into the batched
    # GEMMs. The out-projection contracts (h, d) in one dot, skipping the
    # merge-heads copy as well.
    def heads_inplace(t):
        return t.reshape(b, l, num_heads, head_dim)

    q, k, v = heads_inplace(q), heads_inplace(k), heads_inplace(v)
    scale = head_dim ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)
    weights = jnp.exp(logits - lax.stop_gradient(
        jnp.max(logits, axis=-1, keepdims=True)))
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    weights_f32 = weights
    weights = weights.astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
    out = jnp.einsum(
        "bqhd,hde->bqe", out,
        out_kernel.astype(x.dtype).reshape(num_heads, head_dim, d))
    out = out + out_bias.astype(x.dtype)
    if return_weights:
        return out, weights_f32
    return out


def _mha_batched_head(x, in_proj_kernel, in_proj_bias, out_kernel,
                      out_bias, num_heads, mask, return_weights):
    """Head-major attention with the head split folded into the qkv
    projection: einsum('bld,dshe->sbhle') is a batched GEMM over (s, h)
    whose OUTPUT is produced in [B, H, L, Dh] layout by the GEMM itself —
    there is no head-split reshape for XLA's layout assignment to
    materialize. Numerically identical to the inplace path (same
    contractions, fp32 softmax)."""
    b, l, d = x.shape
    head_dim = d // num_heads
    w = in_proj_kernel.astype(x.dtype).reshape(d, 3, num_heads, head_dim)
    bias = in_proj_bias.astype(x.dtype).reshape(3, num_heads, 1, head_dim)
    qkv = jnp.einsum("bld,dshe->sbhle", x, w) + bias[:, None]
    q, k, v = qkv[0], qkv[1], qkv[2]          # [B, H, L, Dh]
    scale = head_dim ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)
    weights = jnp.exp(logits - lax.stop_gradient(
        jnp.max(logits, axis=-1, keepdims=True)))
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    weights_f32 = weights
    weights = weights.astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
    out = jnp.einsum(
        "bhqd,hde->bqe", out,
        out_kernel.astype(x.dtype).reshape(num_heads, head_dim, d))
    out = out + out_bias.astype(x.dtype)
    if return_weights:
        return out, weights_f32
    return out


def causal_mask(length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Additive causal mask matching module_clip.py:441-447 (upper triangle
    filled with a large negative)."""
    mask = jnp.triu(jnp.full((length, length), -1e9, dtype=dtype), k=1)
    return mask[None, None, :, :]
