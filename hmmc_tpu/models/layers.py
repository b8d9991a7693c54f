"""Shared transformer building blocks (flax.linen).

Design notes (TPU-first, not a torch translation):

- batch-first [B, L, D] layout everywhere — no NLD<->LND permutes
  (the reference permutes for torch's nn.MultiheadAttention,
  module_clip.py:314-317; XLA has no such constraint);
- parameters live in fp32 (`param_dtype`), activations in a configurable
  compute dtype (bf16 on TPU) — replacing the reference's fp16 weight
  conversion (module_clip.py:506-527);
- LayerNorm always computes statistics in fp32 and casts back, matching the
  fp16-safe LayerNorm subclass of the reference (module_clip.py:217-223);
- transformer layers are stacked with `nn.scan`: layer parameters get a
  leading [layers] axis and the checkpoint importer stacks per-layer
  torch tensors accordingly. The scan BODY is fully unrolled by default
  (`Transformer.unroll=0`): the rolled loop's backward accumulates
  per-layer grads through a copy+dynamic-update-slice chain that costs
  ~26% of the train step, while unrolling keeps the stacked layout and
  lets XLA alias the writes (203 -> 244 clips/s measured). Set a finite
  unroll only if compile time ever matters more than step time.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from hmmc_tpu.ops.attention import multi_head_attention

Dtype = Any


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """QuickGELU: x * sigmoid(1.702 x) (module_cross.py:110-112)."""
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_erf(x: jnp.ndarray) -> jnp.ndarray:
    """Exact erf GELU (until_module.py:29-34), used by the MLM head."""
    return jax.nn.gelu(x, approximate=False)


ACT2FN = {"gelu": gelu_erf, "relu": jax.nn.relu, "quick_gelu": quick_gelu,
          "swish": jax.nn.silu}


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    """fp32-statistics LayerNorm returning the input dtype — THE layer-norm
    numerics (eps, fp32 stats, cast-back), shared by the flax
    :class:`LayerNorm` module and the pure-function block path
    (:func:`block_forward` / ops.token_filter)."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(orig_dtype)


def block_forward(x: jnp.ndarray, p, num_heads: int,
                  mask: Optional[jnp.ndarray] = None,
                  return_weights: bool = False,
                  use_pallas: bool = False):
    """One pre-LN residual attention block as a PURE function over a
    per-layer parameter dict ``p`` with the module tree's layout
    ({ln_1,ln_2}{scale,bias}, attn{in_proj_kernel,in_proj_bias,out_kernel,
    out_bias}, {c_fc,c_proj}{kernel,bias}) — the single block
    implementation behind both the flax :class:`ResidualAttentionBlock`
    (same layer_norm / multi_head_attention / quick_gelu pieces, params
    held by submodules) and the stacked-leaf eval paths
    (ops.token_filter). Compute dtype follows ``x.dtype``.
    ``use_pallas`` selects the fused attention kernel; it is ignored for
    ``return_weights`` calls (the kernel never materializes the
    probabilities)."""
    dtype = x.dtype
    h = layer_norm(x, p["ln_1"]["scale"], p["ln_1"]["bias"])
    attn = p["attn"]
    out = multi_head_attention(
        h, attn["in_proj_kernel"], attn["in_proj_bias"],
        attn["out_kernel"], attn["out_bias"], num_heads, mask,
        return_weights=return_weights,
        use_pallas=use_pallas and not return_weights and mask is None)
    weights = None
    if return_weights:
        out, weights = out
    x = x + out
    h = layer_norm(x, p["ln_2"]["scale"], p["ln_2"]["bias"])
    h = jnp.dot(h, p["c_fc"]["kernel"].astype(dtype))
    h = h + p["c_fc"]["bias"].astype(dtype)
    h = quick_gelu(h)
    h = jnp.dot(h, p["c_proj"]["kernel"].astype(dtype))
    h = h + p["c_proj"]["bias"].astype(dtype)
    x = x + h
    return (x, weights) if return_weights else x


def stacked_block_forward(x: jnp.ndarray, stacked, i: int, num_heads: int,
                          mask: Optional[jnp.ndarray] = None,
                          return_weights: bool = False,
                          use_pallas: bool = False):
    """:func:`block_forward` over the nn.scan-stacked [layers, ...]
    parameter leaves at layer index ``i`` (the Transformer module stacks
    per-layer params along a leading axis; eval-path pure functions index
    that layout directly so checkpoints need no re-layout)."""
    p = jax.tree_util.tree_map(lambda leaf: leaf[i], stacked)
    return block_forward(x, p, num_heads, mask, return_weights, use_pallas)


class LayerNorm(nn.Module):
    """fp32-statistics LayerNorm returning the input dtype (numerics in
    :func:`layer_norm`).

    eps defaults to torch nn.LayerNorm's 1e-5 (CLIP towers); the MLM head
    uses 1e-12 (module_cross.py:344-357).
    """

    eps: float = 1e-5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        scale = self.param(
            "scale", nn.initializers.ones, (dim,), self.param_dtype)
        bias = self.param(
            "bias", nn.initializers.zeros, (dim,), self.param_dtype)
        return layer_norm(x, scale, bias, self.eps)


class Linear(nn.Module):
    """Dense layer with an explicit [in, out] kernel (torch checkpoints store
    [out, in]; the importer transposes)."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features),
            self.param_dtype)
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,),
                self.param_dtype)
            y = y + bias.astype(self.dtype)
        return y


class SelfAttention(nn.Module):
    """Packed-qkv self-attention (parameter layout mirrors torch
    nn.MultiheadAttention's in_proj/out_proj for checkpoint import)."""

    num_heads: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_pallas: bool = False
    causal: bool = False
    # sow the fp32 softmax probabilities into the 'intermediates'
    # collection (visualization/introspection; default off keeps the
    # compiled train/eval programs byte-identical)
    sow_attn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        d = x.shape[-1]
        std = d ** -0.5
        in_proj_kernel = self.param(
            "in_proj_kernel", nn.initializers.normal(std), (d, 3 * d),
            self.param_dtype)
        in_proj_bias = self.param(
            "in_proj_bias", nn.initializers.zeros, (3 * d,), self.param_dtype)
        out_kernel = self.param(
            "out_kernel", nn.initializers.normal(std), (d, d),
            self.param_dtype)
        out_bias = self.param(
            "out_bias", nn.initializers.zeros, (d,), self.param_dtype)
        if self.sow_attn:
            out, weights = multi_head_attention(
                x.astype(self.dtype), in_proj_kernel, in_proj_bias,
                out_kernel, out_bias, self.num_heads, mask,
                use_pallas=False, causal=self.causal, return_weights=True)
            self.sow("intermediates", "attn_weights", weights)
            return out
        return multi_head_attention(
            x.astype(self.dtype), in_proj_kernel, in_proj_bias, out_kernel,
            out_bias, self.num_heads, mask, use_pallas=self.use_pallas,
            causal=self.causal)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN transformer block with a QuickGELU MLP
    (module_clip.py:231-257)."""

    num_heads: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_pallas: bool = False
    causal: bool = False
    sow_attn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        d = x.shape[-1]
        attn = SelfAttention(
            self.num_heads, dtype=self.dtype, param_dtype=self.param_dtype,
            use_pallas=self.use_pallas, causal=self.causal,
            sow_attn=self.sow_attn, name="attn")
        ln_1 = LayerNorm(param_dtype=self.param_dtype, name="ln_1")
        ln_2 = LayerNorm(param_dtype=self.param_dtype, name="ln_2")
        c_fc = Linear(4 * d, dtype=self.dtype, param_dtype=self.param_dtype,
                      name="c_fc")
        c_proj = Linear(d, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="c_proj")
        x = x + attn(ln_1(x), mask)
        x = x + c_proj(quick_gelu(c_fc(ln_2(x))))
        return x


class _ScanBlock(nn.Module):
    """scan body: carry = activations, broadcast input = mask."""

    num_heads: int
    dtype: Dtype
    param_dtype: Dtype
    use_pallas: bool
    causal: bool
    sow_attn: bool = False

    @nn.compact
    def __call__(self, x, mask):
        y = ResidualAttentionBlock(
            self.num_heads, dtype=self.dtype, param_dtype=self.param_dtype,
            use_pallas=self.use_pallas, causal=self.causal,
            sow_attn=self.sow_attn, name="block")(x, mask)
        return y, None


class Transformer(nn.Module):
    """Stack of residual attention blocks via nn.scan (params get a leading
    [layers] axis)."""

    layers: int
    num_heads: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_pallas: bool = False
    remat: Any = False  # False | True (full) | "dots" (selective)
    causal: bool = False
    # lax.scan unroll factor; 0 = full unroll (default). Parameters stay
    # stacked [layers, ...] (checkpoint layout unchanged) but the loop
    # body unrolls, letting XLA alias the backward's per-layer grad
    # writes instead of chaining copy+dynamic-update-slice per iteration
    # (profiled at ~26% of the rolled train step; full unroll measured
    # 244 vs 203 clips/s on ViT-B/32 @ v5e — partial unroll=4 is WORSE,
    # 122, so the knob is full-or-rolled in practice).
    unroll: int = 0
    sow_attn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        body = _ScanBlock
        if self.remat:
            # remat=True: full-block rematerialization. remat="dots":
            # selective — matmul outputs are saved, elementwise/LN/GELU
            # recomputed (the cheap-recompute policy; trades ~zero extra
            # MXU work for most of the activation-memory win)
            policy = None
            if self.remat == "dots":
                import jax

                policy = (jax.checkpoint_policies
                          .dots_with_no_batch_dims_saveable)
            body = nn.remat(body, prevent_cse=False, policy=policy)
        stack = nn.scan(
            body,
            # 'intermediates' rides the scan axis so sown attention
            # probabilities come out stacked [layers, ...]; nothing is
            # written (or even traced) unless sow_attn is set AND the
            # caller passes mutable=['intermediates']
            variable_axes={"params": 0, "intermediates": 0},
            split_rngs={"params": True},
            length=self.layers,
            in_axes=nn.broadcast,
            unroll=min(self.unroll or self.layers, self.layers),
        )(self.num_heads, self.dtype, self.param_dtype, self.use_pallas,
          self.causal, self.sow_attn, name="resblocks")
        x, _ = stack(x, mask)
        return x
