"""Text towers.

- :class:`ClipTextTower`: CLIP's causal text transformer with EOT pooling
  (behavior of module_clip.py:470-487 / module_cross.py:287-305).
- :class:`BertEncoder`: a standard post-LN BERT/RoBERTa encoder for the
  Chinese branch (the reference loads ``hfl/chinese-roberta-wwm-ext`` via HF
  AutoModel, module_cross.py:257-265; here the encoder is implemented
  natively and weights are imported from the torch checkpoint).
- :class:`TextEncoder`: language dispatch + projection, mirroring
  module_cross.py:240-305. English text features come straight from the CLIP
  tower; Chinese features go through a linear projection from
  chinese_hidden_size (768) to temporal_hidden_size (512).

``logit_scale`` note: the reference deep-copies the CLIP checkpoint's
logit_scale tensor onto the TextEncoder as a plain attribute — it is NOT a
torch Parameter, so it is never trained and effectively a constant
exp(logit_scale)=100 after the clamp (modeling.py:216-217). Here it is a
flax param initialized to ln(100), excluded from gradients via
stop_gradient at use sites.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from hmmc_tpu.config import ClipArch, CrossConfig
from hmmc_tpu.models.layers import (
    ACT2FN, LayerNorm, Linear, SelfAttention, Transformer)
from hmmc_tpu.ops.attention import causal_mask

Dtype = Any


class ClipTextTower(nn.Module):
    arch: ClipArch
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_pallas: bool = False
    # sow per-layer attention probabilities (visualization path)
    sow_attn: bool = False

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, return_hidden: bool = False):
        """input_ids: [B, L] int32. Pooled feature = projected hidden at the
        EOT position, located via argmax of ids (pad id is 0 in the
        reference's padding scheme, so EOT=49407 is the row max —
        module_clip.py:482)."""
        a = self.arch
        width = a.transformer_width

        token_embedding = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (a.vocab_size, width), self.param_dtype)
        positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (a.context_length, width), self.param_dtype)
        text_projection = self.param(
            "text_projection", nn.initializers.normal(width ** -0.5),
            (width, a.embed_dim), self.param_dtype)

        l = input_ids.shape[1]
        x = token_embedding[input_ids].astype(self.dtype)
        x = x + positional_embedding[:l].astype(self.dtype)
        x = Transformer(
            layers=a.transformer_layers, num_heads=a.transformer_heads,
            dtype=self.dtype, param_dtype=self.param_dtype,
            use_pallas=self.use_pallas, causal=True,
            sow_attn=self.sow_attn, name="transformer")(
                x, causal_mask(l))
        hidden = LayerNorm(param_dtype=self.param_dtype, name="ln_final")(x)
        hidden = hidden @ text_projection.astype(self.dtype)

        eot = jnp.argmax(input_ids, axis=-1)
        pooled = jnp.take_along_axis(
            hidden, eot[:, None, None], axis=1)[:, 0, :]
        pooled = pooled.astype(jnp.float32)
        if return_hidden:
            return pooled, hidden.astype(jnp.float32)
        return pooled


class BertSelfAttentionBlock(nn.Module):
    """Post-LN BERT layer (HF BertLayer semantics)."""

    num_heads: int
    intermediate_size: int
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-12
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        attn = SelfAttention(
            self.num_heads, dtype=self.dtype, param_dtype=self.param_dtype,
            name="attn")(x, mask)
        x = LayerNorm(eps=self.layer_norm_eps, param_dtype=self.param_dtype,
                      name="attn_ln")(x + attn)
        h = Linear(self.intermediate_size, dtype=self.dtype,
                   param_dtype=self.param_dtype, name="intermediate")(x)
        h = ACT2FN[self.hidden_act](h)
        h = Linear(x.shape[-1], dtype=self.dtype,
                   param_dtype=self.param_dtype, name="output")(h)
        x = LayerNorm(eps=self.layer_norm_eps, param_dtype=self.param_dtype,
                      name="output_ln")(x + h)
        return x, None


class BertEncoder(nn.Module):
    """BERT/RoBERTa-base style encoder with pooler (for the Chinese tower)."""

    vocab_size: int = 21128
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None):
        b, l = input_ids.shape
        word = self.param(
            "word_embeddings", nn.initializers.normal(0.02),
            (self.vocab_size, self.hidden_size), self.param_dtype)
        pos = self.param(
            "position_embeddings", nn.initializers.normal(0.02),
            (self.max_position_embeddings, self.hidden_size),
            self.param_dtype)
        tok_type = self.param(
            "token_type_embeddings", nn.initializers.normal(0.02),
            (self.type_vocab_size, self.hidden_size), self.param_dtype)

        x = word[input_ids] + pos[:l][None] + tok_type[0][None, None]
        x = LayerNorm(eps=self.layer_norm_eps, param_dtype=self.param_dtype,
                      name="embeddings_ln")(x.astype(self.dtype))

        if attention_mask is not None:
            # additive mask over keys: 0 where attending, large-neg where pad
            add_mask = (1.0 - attention_mask.astype(jnp.float32))
            add_mask = add_mask[:, None, None, :] * -1e9
        else:
            add_mask = None

        stack = nn.scan(
            BertSelfAttentionBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.num_layers,
            in_axes=nn.broadcast,
            # full unroll like models.layers.Transformer: the scan
            # backward's per-layer grad accumulation (copy + DUS chain)
            # costs ~26% of a rolled train step
            unroll=self.num_layers,
        )(self.num_heads, self.intermediate_size,
          layer_norm_eps=self.layer_norm_eps, dtype=self.dtype,
          param_dtype=self.param_dtype, name="layer")
        x, _ = stack(x, add_mask)

        pooled = Linear(self.hidden_size, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="pooler")(x[:, 0])
        pooled = jnp.tanh(pooled)
        return x, pooled


class TextEncoder(nn.Module):
    """Language-dispatching text encoder (module_cross.py:240-305)."""

    arch: ClipArch
    cross_config: CrossConfig = CrossConfig()
    language: str = "english"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_pallas: bool = False
    chinese_vocab_size: int = 21128
    # sow per-layer attention probabilities (english/CLIP tower only;
    # visualization path — tools/visualize_attention.py)
    sow_attn: bool = False

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None,
                 return_hidden: bool = False):
        # constant in the reference (see module docstring)
        self.param("logit_scale",
                   nn.initializers.constant(math.log(100.0)), (),
                   jnp.float32)
        if self.language == "english":
            out = ClipTextTower(
                self.arch, dtype=self.dtype, param_dtype=self.param_dtype,
                use_pallas=self.use_pallas, sow_attn=self.sow_attn,
                name="clip_text")(
                    input_ids, return_hidden=True)
            pooled, hidden = out
        elif self.language == "chinese":
            cc = self.cross_config
            hidden, pooled_raw = BertEncoder(
                vocab_size=self.chinese_vocab_size,
                hidden_size=cc.chinese_hidden_size,
                num_layers=cc.chinese_num_layers,
                num_heads=cc.chinese_num_heads,
                intermediate_size=cc.chinese_intermediate_size,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="chinese_encoder")(input_ids, attention_mask)
            proj = Linear(
                self.cross_config.temporal_hidden_size, dtype=self.dtype,
                param_dtype=self.param_dtype, name="text_proj")
            pooled = proj(pooled_raw).astype(jnp.float32)
            hidden = proj(hidden).astype(jnp.float32)
        else:
            raise NotImplementedError(f"wrong language {self.language!r}")
        return hidden if return_hidden else pooled

    def get_logit_scale(self, params) -> jnp.ndarray:
        """Clamped, non-trainable similarity temperature
        (modeling.py:216-217)."""
        scale = jnp.exp(jax.lax.stop_gradient(params["logit_scale"]))
        return jnp.minimum(scale, 100.0)
