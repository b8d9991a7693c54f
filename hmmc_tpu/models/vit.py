"""CLIP Vision Transformer (flax).

Re-implements the behavior of the reference's VisualTransformer
(module_clip.py:271-325) and the pooled projection of encode_image
(module_cross.py:222-237):

- 2d patch embedding conv (or 3d tube conv across frames,
  module_clip.py:291-305) — NHWC layout, TPU-native;
- class token + positional embedding + ln_pre;
- pre-LN transformer;
- pooled output = ln_post(token 0) @ proj. The reference applies
  ln_post/proj to the whole sequence then slices token 0
  (module_cross.py:228-230); mathematically identical, this version slices
  first to skip ~98% of that work.

Outputs are cast to fp32 like the reference's encode_image (.float(),
module_cross.py:236-237).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from hmmc_tpu.config import ClipArch
from hmmc_tpu.models.layers import LayerNorm, Transformer

Dtype = Any


class VisionTransformer(nn.Module):
    arch: ClipArch
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_pallas: bool = False
    remat: Any = False  # False | True (full) | "dots" (selective)
    # sow per-layer attention probabilities (tools/visualize_attention.py)
    sow_attn: bool = False

    @nn.compact
    def __call__(
        self,
        pixels: jnp.ndarray,
        return_hidden: bool = False,
    ) -> jnp.ndarray:
        """pixels: [N, H, W, 3] (2d patch) or [N, F, H, W, 3] (3d patch),
        already normalized floats. Returns pooled [N, embed_dim] (and the
        projected hidden sequence if return_hidden)."""
        a = self.arch
        width, patch = a.vision_width, a.vision_patch_size
        scale = width ** -0.5

        if a.linear_patch == "3d":
            # tube conv: kernel (3, p, p), stride (1, p, p), pad 1 on frames
            # (module_clip.py:294-305); input [N, F, H, W, 3]
            x = nn.Conv(
                width, kernel_size=(3, patch, patch),
                strides=(1, patch, patch),
                padding=((1, 1), (0, 0), (0, 0)), use_bias=False,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="conv2")(pixels.astype(self.dtype))
            n, f, gh, gw, _ = x.shape
            x = x.reshape(n * f, gh * gw, width)
        else:
            x = nn.Conv(
                width, kernel_size=(patch, patch), strides=(patch, patch),
                use_bias=False, dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="conv1")(pixels.astype(self.dtype))
            n, gh, gw, _ = x.shape
            x = x.reshape(n, gh * gw, width)

        class_embedding = self.param(
            "class_embedding", nn.initializers.normal(scale), (width,),
            self.param_dtype)
        positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(scale),
            (a.grid_size ** 2 + 1, width), self.param_dtype)
        proj = self.param(
            "proj", nn.initializers.normal(scale), (width, a.embed_dim),
            self.param_dtype)

        cls = jnp.broadcast_to(
            class_embedding.astype(self.dtype), (x.shape[0], 1, width))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + positional_embedding.astype(self.dtype)
        x = LayerNorm(param_dtype=self.param_dtype, name="ln_pre")(x)
        x = Transformer(
            layers=a.vision_layers, num_heads=a.vision_heads,
            dtype=self.dtype, param_dtype=self.param_dtype,
            use_pallas=self.use_pallas, remat=self.remat,
            sow_attn=self.sow_attn, name="transformer")(x)

        ln_post = LayerNorm(param_dtype=self.param_dtype, name="ln_post")
        pooled = ln_post(x[:, 0, :]) @ proj.astype(self.dtype)
        pooled = pooled.astype(jnp.float32)
        if return_hidden:
            hidden = ln_post(x) @ proj.astype(self.dtype)
            return pooled, hidden.astype(jnp.float32)
        return pooled
