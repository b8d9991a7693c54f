"""Device mesh + sharding helpers.

The reference's distribution model is one-process-per-GPU DDP over NCCL with
explicit differentiable all-gathers (SURVEY §2.9). The TPU-native model is a
single logical program over a named mesh:

- axis ``data``: batch sharding (DP). Gradients are averaged implicitly by
  the sharded loss mean; the global BxB sim matrix of the contrastive loss
  is a sharded einsum (XLA inserts the all-gather over ICI) — replacing
  ``dist_collect`` (modeling.py:25-36).
- axis ``model``: reserved for tensor parallelism; size 1 at ViT-B scale
  (SURVEY §2.9 "design mesh axes so a model axis can be added later").

All arrays live as global jax.Arrays; there is no per-process rank logic in
user code.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    dp: int = 0      # 0 = all devices
    tp: int = 1

    def resolve(self, n_devices: int) -> "MeshSpec":
        dp = self.dp or (n_devices // self.tp)
        return MeshSpec(dp=dp, tp=self.tp)


def make_mesh(spec: MeshSpec = MeshSpec(),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    spec = spec.resolve(len(devices))
    n = spec.dp * spec.tp
    if n > len(devices):
        raise ValueError(
            f"mesh {spec} needs {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(spec.dp, spec.tp)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over data."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host pytree of arrays onto the mesh, batch-axis sharded."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)
