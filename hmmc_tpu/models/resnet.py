"""CLIP ModifiedResNet visual tower (reference: module_clip.py:68-214).

Dead code in the reference's default config (ViT-B/32 is always selected —
SURVEY §2), but part of the CLIP backbone surface: RN50-style towers with a
3-conv stem, anti-aliased strided bottlenecks (avgpool before stride-1
conv), and attention pooling instead of global average pooling. Implemented
NHWC (TPU-native conv layout); BatchNorm runs with frozen/running stats at
inference and batch stats under train (flax nn.BatchNorm).

Select by setting CrossConfig.pretrained_clip_name to "RN50"/"RN101" (see
config.CLIP_ARCH entries with ``vision_kind='resnet'``).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from hmmc_tpu.ops.attention import dot_product_attention

Dtype = Any


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        def conv(feat, k, name):
            return nn.Conv(feat, (k, k), padding="SAME" if k > 1 else 0,
                           use_bias=False, dtype=self.dtype,
                           param_dtype=self.param_dtype, name=name)

        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=self.dtype,
                                param_dtype=self.param_dtype, name=name)

        out_ch = self.planes * self.expansion
        identity = x
        out = nn.relu(bn("bn1")(conv(self.planes, 1, "conv1")(x)))
        out = nn.relu(bn("bn2")(conv(self.planes, 3, "conv2")(out)))
        if self.stride > 1:
            out = nn.avg_pool(out, (self.stride, self.stride),
                              (self.stride, self.stride))
        out = bn("bn3")(conv(out_ch, 1, "conv3")(out))
        if self.stride > 1 or x.shape[-1] != out_ch:
            identity = x
            if self.stride > 1:
                identity = nn.avg_pool(identity, (self.stride, self.stride),
                                       (self.stride, self.stride))
            identity = conv(out_ch, 1, "downsample_conv")(identity)
            identity = bn("downsample_bn")(identity)
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """QKV attention pooling over the spatial grid + mean token
    (module_clip.py:115-156)."""

    embed_dim: int
    num_heads: int
    output_dim: int
    spacial_dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [N, H, W, C] -> tokens [N, HW+1, C] with mean prepended
        n, h, w, c = x.shape
        tokens = x.reshape(n, h * w, c)
        mean = jnp.mean(tokens, axis=1, keepdims=True)
        tokens = jnp.concatenate([mean, tokens], axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(self.embed_dim ** -0.5),
                         (self.spacial_dim ** 2 + 1, self.embed_dim),
                         self.param_dtype)
        tokens = tokens + pos.astype(tokens.dtype)

        def proj(feat, name):
            return nn.Dense(feat, dtype=self.dtype,
                            param_dtype=self.param_dtype, name=name)

        q = proj(self.embed_dim, "q_proj")(tokens[:, :1])
        k = proj(self.embed_dim, "k_proj")(tokens)
        v = proj(self.embed_dim, "v_proj")(tokens)
        hd = self.embed_dim // self.num_heads

        def heads(t):
            return t.reshape(n, t.shape[1], self.num_heads, hd
                             ).transpose(0, 2, 1, 3)

        out = dot_product_attention(heads(q), heads(k), heads(v))
        out = out.transpose(0, 2, 1, 3).reshape(n, 1, self.embed_dim)[:, 0]
        return proj(self.output_dim, "c_proj")(out)


class ModifiedResNet(nn.Module):
    """module_clip.py:159-214 in NHWC."""

    layers: Sequence[int]
    output_dim: int
    heads: int
    input_resolution: int = 224
    width: int = 64
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray, train: bool = False
                 ) -> jnp.ndarray:
        x = pixels.astype(self.dtype)

        def conv(feat, stride, name):
            return nn.Conv(feat, (3, 3), strides=(stride, stride),
                           padding=1, use_bias=False, dtype=self.dtype,
                           param_dtype=self.param_dtype, name=name)

        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype,
                                param_dtype=self.param_dtype, name=name)

        # 3-conv stem + avgpool
        x = nn.relu(bn("bn1")(conv(self.width // 2, 2, "conv1")(x)))
        x = nn.relu(bn("bn2")(conv(self.width // 2, 1, "conv2")(x)))
        x = nn.relu(bn("bn3")(conv(self.width, 1, "conv3")(x)))
        x = nn.avg_pool(x, (2, 2), (2, 2))

        planes = self.width
        for stage, blocks in enumerate(self.layers):
            stride = 1 if stage == 0 else 2
            x = Bottleneck(planes, stride, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           name=f"layer{stage + 1}_0")(x, train)
            for b in range(1, blocks):
                x = Bottleneck(planes, 1, dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name=f"layer{stage + 1}_{b}")(x, train)
            planes *= 2

        embed_dim = self.width * 32
        return AttentionPool2d(
            embed_dim=embed_dim, num_heads=self.heads,
            output_dim=self.output_dim,
            spacial_dim=self.input_resolution // 32, dtype=self.dtype,
            param_dtype=self.param_dtype, name="attnpool")(x)
