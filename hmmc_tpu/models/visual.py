"""Visual encoder: per-frame CLIP ViT + temporal transformer.

Behavior of module_cross.py:152-237:

- every frame goes through the ViT; frame features BEFORE the temporal
  transformer are returned as ``frame_output`` (module_cross.py:191-192);
- if ``use_temp``: add learned frame position embeddings, run the 4-layer
  temporal transformer, add the residual (module_cross.py:193-207). The
  reference builds its temporal attention mask from all-ones, which makes it
  a no-op even for padded frames (module_cross.py:201-203) — reproduced by
  passing no mask (a real frame mask can be supplied via ``frame_mask`` to
  knowingly fix that quirk);
- the video feature is the mean over frames of L2-NORMALIZED per-frame
  vectors (normalize-then-mean, module_cross.py:210-212 — a documented
  reference quirk, reproduced for checkpoint parity).

Inputs are [B, F, H, W, 3] already-normalized floats (the uint8→float
normalization runs on device in the input step, see hmmc_tpu.ops.image_ops).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from hmmc_tpu.config import ClipArch, CrossConfig
from hmmc_tpu.models.layers import Transformer
from hmmc_tpu.models.vit import VisionTransformer

Dtype = Any


class VisualEncoder(nn.Module):
    arch: ClipArch
    cross_config: CrossConfig = CrossConfig()
    use_temp: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_pallas: bool = False
    remat: Any = False  # False | True (full) | "dots" (selective)
    # sow per-layer attention probabilities from the ViT and the temporal
    # transformer (tools/visualize_attention.py); ViT towers only
    sow_attn: bool = False

    @nn.compact
    def __call__(
        self,
        video: jnp.ndarray,
        frame_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """video: [B, F, H, W, 3]. Returns (video_feature [B, D] fp32,
        frame_features [B, F, D] fp32). ``train`` only affects the
        ResNet towers' BatchNorm mode (batch stats + running-stat
        updates vs frozen running averages); the ViT towers have no
        train-time stochasticity."""
        b, f, h, w, c = video.shape
        cc = self.cross_config

        if self.arch.is_resnet:
            from hmmc_tpu.models.resnet import ModifiedResNet

            tower = ModifiedResNet(
                layers=tuple(self.arch.vision_layers),
                output_dim=self.arch.embed_dim, heads=self.arch.vision_heads,
                input_resolution=self.arch.image_resolution,
                width=self.arch.vision_width, dtype=self.dtype,
                param_dtype=self.param_dtype, name="visual")
            per_frame = tower(video.reshape(b * f, h, w, c), train).astype(
                jnp.float32)
        else:
            vit = VisionTransformer(
                self.arch, dtype=self.dtype, param_dtype=self.param_dtype,
                use_pallas=self.use_pallas, remat=self.remat,
                sow_attn=self.sow_attn, name="visual")
            if self.arch.linear_patch == "3d":
                per_frame = vit(video)  # tube conv handles the frame axis
            else:
                per_frame = vit(video.reshape(b * f, h, w, c))
        hidden = per_frame.reshape(b, f, per_frame.shape[-1])
        frame_output = hidden

        if self.use_temp:
            # Sized from the tower's actual output width. The reference
            # hard-codes temporal_hidden_size (=512) here, which only
            # works because its default ViT-B towers have embed_dim 512 —
            # at RN50 (1024) or ViT-L/14 (768) its add at
            # module_cross.py:198 throws. Same layout at flagship,
            # working temporal path for every tower (knowing fix).
            frame_position_embeddings = self.param(
                "frame_position_embeddings",
                nn.initializers.normal(0.02),
                (cc.max_position_embeddings, hidden.shape[-1]),
                self.param_dtype)
            x = hidden + frame_position_embeddings[:f].astype(hidden.dtype)
            if frame_mask is not None:
                add_mask = (1.0 - frame_mask.astype(jnp.float32))
                add_mask = add_mask[:, None, None, :] * -1e6
            else:
                add_mask = None  # reference quirk: all-ones mask == no mask
            x = Transformer(
                layers=cc.temporal_hidden_layers,
                num_heads=cc.temporal_attention_heads,
                dtype=self.dtype, param_dtype=self.param_dtype,
                use_pallas=self.use_pallas, sow_attn=self.sow_attn,
                name="temporal_transformer")(x.astype(self.dtype), add_mask)
            hidden = x.astype(jnp.float32) + hidden

        # normalize-then-mean (module_cross.py:210-212)
        normed = hidden / jnp.linalg.norm(hidden, axis=-1, keepdims=True)
        video_feature = jnp.mean(normed, axis=1)
        return video_feature.astype(jnp.float32), frame_output
