"""Prediction heads: MLM head and the MoCo projector/predictor MLPs.

- :class:`MLMHead` — BERT LM prediction head (module_cross.py:308-341):
  dense → erf-GELU → LayerNorm(eps 1e-12) → untied vocab decoder with bias.
- :class:`ProjectorMLP` — the SimSiam-style projector/predictor
  (modeling.py:788-807): (num_layers-1) × [Linear → BatchNorm → ReLU]
  followed by a final Linear. The reference converts these to SyncBatchNorm
  (modeling.py:115-129); here the train step sees the full global batch
  under jit, so plain BatchNorm over the batch axis IS sync-BN — XLA inserts
  the cross-chip reductions for the batch statistics automatically.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from hmmc_tpu.models.layers import LayerNorm, Linear, gelu_erf

Dtype = Any


class MLMHead(nn.Module):
    vocab_size: int
    hidden_act: str = "gelu"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jnp.ndarray) -> jnp.ndarray:
        d = hidden.shape[-1]
        x = Linear(d, dtype=self.dtype, param_dtype=self.param_dtype,
                   name="transform_dense")(hidden)
        x = gelu_erf(x)
        x = LayerNorm(eps=1e-12, param_dtype=self.param_dtype,
                      name="transform_ln")(x)
        logits = Linear(self.vocab_size, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="decoder")(x)
        return logits


class ProjectorMLP(nn.Module):
    """modeling.py:788-807. num_layers=1 → single Linear; num_layers>=2 →
    hidden [Linear→BN→ReLU] blocks then a Linear out."""

    num_layers: int = 2
    in_dim: int = 512
    inner_dim: int = 4096
    out_dim: int = 512
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        for i in range(self.num_layers - 1):
            x = Linear(self.inner_dim, dtype=self.dtype,
                       param_dtype=self.param_dtype, name=f"hidden_{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"bn_{i}")(x)
            x = nn.relu(x)
        x = Linear(self.out_dim, dtype=self.dtype,
                   param_dtype=self.param_dtype, name="out")(x)
        return x
