"""Fine-tune retrieval models (reference: BirdModel / BirdModel_VT,
modeling.py:648-785).

These are thin flax containers over the encoder stack; the training LOSS is
assembled in :mod:`hmmc_tpu.train.trainer` from the pure functions in
:mod:`hmmc_tpu.losses`. That split is deliberate TPU design: the encoders
are jit-compiled once, while loss composition (global-batch sim matrices)
runs on globally-sharded arrays under the same jit — the cross-chip
all-gather the reference does explicitly with diffdist (modeling.py:698-700)
becomes an XLA-inserted collective of a sharded einsum.

Methods are exposed via ``apply(..., method=...)`` so the evaluator can run
``encode_text`` / ``encode_video`` with feature caching, matching the
two-phase eval of main_task_retrieval.py:383-441.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hmmc_tpu.config import ClipArch, CrossConfig
from hmmc_tpu.models.text import TextEncoder
from hmmc_tpu.models.visual import VisualEncoder

Dtype = Any


class BirdModel(nn.Module):
    """Query-text / video dual encoder for retrieval fine-tuning.

    Reference ctor: modeling.py:648-663. ``use_frame_fea`` only affects the
    loss/eval composition, not the parameter set, so it lives in TaskConfig
    rather than here.
    """

    arch: ClipArch
    cross_config: CrossConfig = CrossConfig()
    language: str = "english"
    use_temp: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_pallas: bool = False
    remat: Any = False  # False | True (full) | "dots" (selective)
    chinese_vocab_size: int = 21128

    def setup(self):
        self.text_encoder = TextEncoder(
            self.arch, self.cross_config, language=self.language,
            dtype=self.dtype, param_dtype=self.param_dtype,
            use_pallas=self.use_pallas,
            chinese_vocab_size=self.chinese_vocab_size)
        self.visual_encoder = VisualEncoder(
            self.arch, self.cross_config, use_temp=self.use_temp,
            dtype=self.dtype, param_dtype=self.param_dtype,
            use_pallas=self.use_pallas, remat=self.remat)

    def encode_text(self, input_ids: jnp.ndarray,
                    attention_mask: Optional[jnp.ndarray] = None,
                    return_hidden: bool = False) -> jnp.ndarray:
        return self.text_encoder(input_ids, attention_mask,
                                 return_hidden=return_hidden)

    def encode_video(self, video: jnp.ndarray,
                     frame_mask: Optional[jnp.ndarray] = None,
                     train: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self.visual_encoder(video, frame_mask, train)

    def logit_scale(self) -> jnp.ndarray:
        """exp(logit_scale) clamped to 100, non-trainable
        (modeling.py:216-217)."""
        scale = self.text_encoder.variables["params"]["logit_scale"]
        scale = jnp.exp(jax.lax.stop_gradient(scale))
        return jnp.minimum(scale, 100.0)

    def __call__(self, query_ids: jnp.ndarray, query_mask: jnp.ndarray,
                 video: jnp.ndarray):
        """Init/trace path: returns (query_fea, visual_fea, frame_fea,
        logit_scale)."""
        q = self.encode_text(query_ids, query_mask)
        v, f = self.encode_video(video)
        return q, v, f, self.logit_scale()


class BirdModelVT(BirdModel):
    """Video+title variant (modeling.py:725-785). Same parameter set; the
    reference's forward contrasts query vs title text and its eval mixes
    ``weight_title * sim_title`` into the video sim. NOTE: the reference's
    train path reads an undefined ``self.weight_title`` (modeling.py:773 —
    latent crash, SURVEY §7); here the weight is an explicit argument in the
    trainer, defaulting to the eval-time mixing weight."""

    def encode_title(self, title_ids: jnp.ndarray,
                     title_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        return self.text_encoder(title_ids, title_mask)
