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
import jax
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


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch's EXACT running-stat semantics.

    flax ``nn.BatchNorm`` updates the running variance with the BIASED
    batch variance; torch BatchNorm1d uses the UNBIASED estimate
    (``n/(n-1)``), so a flax-tracked checkpoint drifts from a reference
    run's ``running_var`` even when every forward output is identical.
    Normalization itself uses the biased variance in both frameworks.
    Momentum follows torch's convention: ``new = (1-m)*old + m*batch``
    with m=0.1 (torch default, the reference never overrides it).
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (d,),
                          self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((d,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((d,), jnp.float32))
        if train:
            n = x.size // d
            xf = x.astype(jnp.float32).reshape(-1, d)
            mean = jnp.mean(xf, axis=0)
            var = jnp.mean(jnp.square(xf - mean), axis=0)  # biased
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(
            var + self.epsilon)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(self.dtype)


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
            x = TorchBatchNorm(dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name=f"bn_{i}")(x, train)
            x = nn.relu(x)
        x = Linear(self.out_dim, dtype=self.dtype,
                   param_dtype=self.param_dtype, name="out")(x)
        return x
