"""Device mesh + sharding helpers.

The reference's distribution model is one-process-per-GPU DDP over NCCL with
explicit differentiable all-gathers (SURVEY §2.9). The TPU-native model is a
single logical program over a named mesh:

- axis ``data``: batch sharding (DP). Gradients are averaged implicitly by
  the sharded loss mean; the global BxB sim matrix of the contrastive loss
  is a sharded einsum (XLA inserts the all-gather over ICI) — replacing
  ``dist_collect`` (modeling.py:25-36).
- axis ``seq``: frame-axis sequence parallelism (SP). HMMC's "sequence" is
  the frame axis (SURVEY §5 — text is 77 tokens, patches 50-197, but
  ``--max_frames`` scales to 30-48), and the per-frame ViT is the hot
  compute: it flattens [B, F] into one leading axis (module_cross.py:
  180-185), so sharding the video on BOTH axes runs each chip over
  B/dp x F/sp frames — activation HBM drops sp-fold with NO cross-chip
  traffic inside the tower. Only the tiny temporal transformer +
  normalize-then-mean ([B, F, D], ~25 KB/clip) touch the frame axis
  cross-chip, and GSPMD inserts those gathers. This extends the memory
  envelope of long-frame configs (the B/16 x 30 stretch compiles at
  batch 4/chip max on 16 GB — SP splits that wall across chips).
- axis ``model``: tensor parallelism (Megatron placement, ``--tp_size``);
  size 1 at ViT-B scale (SURVEY §2.9).

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
SEQ_AXIS = "seq"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    dp: int = 0      # 0 = all remaining devices (TOTAL data shards)
    tp: int = 1
    sp: int = 1      # frame-axis sequence-parallel shards
    # multi-slice: how many slice-granules the data axis spans over DCN.
    # dp stays the TOTAL data-parallel size; dp // dcn_dp shards live
    # inside each slice. 1 = single slice (ICI only).
    dcn_dp: int = 1

    def resolve(self, n_devices: int) -> "MeshSpec":
        dp = self.dp or (n_devices // (self.tp * self.sp))
        if self.dcn_dp > 1 and dp % self.dcn_dp:
            raise ValueError(
                f"dp ({dp}) must be divisible by dcn_dp ({self.dcn_dp})")
        return MeshSpec(dp=dp, tp=self.tp, sp=self.sp, dcn_dp=self.dcn_dp)


def _slice_groups(devices, dcn_dp, slice_key=None):
    """Partition ``devices`` into dcn_dp slice groups, preserving the
    given order inside each group (jax.devices() order is ICI-adjacent
    within a slice).

    Group key preference: an explicit ``slice_key`` fn (tests), the
    device's ``slice_index`` (multi-slice TPU), ``process_index``
    (multi-host CPU/GPU), else contiguous chunks (single-process
    backends, where any split is equally valid)."""
    if slice_key is None:
        if getattr(devices[0], "slice_index", None) is not None:
            slice_key = lambda d: d.slice_index
        elif len({d.process_index for d in devices}) > 1:
            slice_key = lambda d: d.process_index
        else:
            chunk = len(devices) // dcn_dp
            order = {id(d): i for i, d in enumerate(devices)}
            slice_key = lambda d: order[id(d)] // chunk
    groups = {}
    for d in devices:
        groups.setdefault(slice_key(d), []).append(d)
    if len(groups) != dcn_dp:
        raise ValueError(
            f"dcn_dp={dcn_dp} but the devices form {len(groups)} slice "
            f"group(s) (keys: {sorted(groups)})")
    return [groups[k] for k in sorted(groups)]


def make_mesh(spec: MeshSpec = MeshSpec(),
              devices: Optional[Sequence[jax.Device]] = None,
              slice_key=None) -> Mesh:
    """Build the (data, seq, model) mesh.

    Single slice (dcn_dp == 1): a flat reshape — devices in jax.devices()
    order are ICI-adjacent, so every axis rides ICI.

    Multi-slice (dcn_dp > 1): the grid is laid out slice-major on the
    data axis — each slice contributes one contiguous [dp/dcn_dp, sp, tp]
    block, so the seq/model collectives and the inner data-parallel
    reduce stay INSIDE a slice (ICI) and only the outer data axis — whose
    lone collective is the once-per-step gradient psum, the one transfer
    that amortizes over a full step — crosses DCN. This is the hybrid
    ICI x DCN recipe of jax's mesh_utils.create_hybrid_device_mesh,
    expressed directly so it also works on backends without
    ``slice_index`` (the CPU meshes the tests run on)."""
    devices = list(devices if devices is not None else jax.devices())
    spec = spec.resolve(len(devices))
    n = spec.dp * spec.sp * spec.tp
    if n > len(devices):
        raise ValueError(
            f"mesh {spec} needs {n} devices, have {len(devices)}")
    if spec.dcn_dp > 1:
        per = n // spec.dcn_dp  # devices per slice block
        groups = _slice_groups(devices, spec.dcn_dp, slice_key)
        short = [i for i, g in enumerate(groups) if len(g) < per]
        if short:
            raise ValueError(
                f"slice group(s) {short} have fewer than {per} devices")
        grid = np.concatenate(
            [np.asarray(g[:per], dtype=object).reshape(
                spec.dp // spec.dcn_dp, spec.sp, spec.tp)
             for g in groups], axis=0)
    else:
        grid = np.asarray(devices[:n]).reshape(spec.dp, spec.sp, spec.tp)
    return Mesh(grid, (DATA_AXIS, SEQ_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over data."""
    return NamedSharding(mesh, P(DATA_AXIS))


def video_sharding(mesh: Mesh) -> NamedSharding:
    """[B, F, ...] video: batch over ``data``, frame axis over ``seq``.

    The model flattens [B, F] into the per-frame tower's leading axis
    (models/visual.py), and GSPMD merges the (data, seq)-sharded pair
    into a (data, seq)-sharded flat axis — each chip runs the ViT on its
    own frames only. With sp == 1 this degenerates to batch_sharding."""
    return NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _leaf_sharding(mesh: Mesh, path, leaf) -> NamedSharding:
    if (SEQ_AXIS in mesh.shape and mesh.shape[SEQ_AXIS] > 1
            and path and getattr(path[-1], "key", None) == "video"
            and np.ndim(leaf) >= 2):
        return video_sharding(mesh)
    return batch_sharding(mesh)


def shard_batch(mesh: Mesh, batch):
    """Place a host pytree of arrays onto the mesh, batch-axis sharded
    (plus frame-axis ``seq`` sharding for the video when sp > 1).

    Single-process: a plain device_put of the global batch. Multi-host
    (jax.process_count() > 1): each leaf is this process's contiguous
    shard of the global batch (produced by BatchLoader's process
    sharding), assembled into one global jax.Array via
    jax.make_array_from_process_local_data — the DistributedSampler +
    DDP equivalent (dataloaders/dataloader.py:14)."""
    if jax.process_count() == 1:
        return jax.tree_util.tree_map_with_path(
            lambda p, x: jax.device_put(x, _leaf_sharding(mesh, p, x)),
            batch)
    return jax.tree_util.tree_map_with_path(
        lambda p, x: jax.make_array_from_process_local_data(
            _leaf_sharding(mesh, p, x), np.asarray(x)), batch)


# ---------------------------------------------------------------------------
# tensor-parallel parameter shardings (the `model` axis)
# ---------------------------------------------------------------------------

def _param_spec(path_names, shape) -> P:
    """Megatron-style placement for transformer blocks: the qkv/up
    projections split over their OUTPUT feature dim, the out/down
    projections over their INPUT dim, so each block needs one psum on its
    output. Everything else (embeddings, LayerNorms, biases of row-parallel
    layers) is replicated — fine at ViT-B scale, where TP exists for
    headroom rather than necessity (SURVEY §2.9)."""
    leaf = path_names[-1]
    module = path_names[-2] if len(path_names) > 1 else ""
    nd = len(shape)
    # scan-stacked blocks have a leading [layers] axis -> specs shift by 1
    lead = (None,) * (nd - 2)
    if leaf == "in_proj_kernel":                       # [..., D, 3D]
        return P(*lead, None, MODEL_AXIS)
    if leaf == "in_proj_bias" and nd >= 1:             # [..., 3D]
        return P(*((None,) * (nd - 1)), MODEL_AXIS)
    if leaf == "out_kernel":                           # [..., D, D] row-par
        return P(*lead, MODEL_AXIS, None)
    if leaf == "kernel" and module == "c_fc":          # [..., D, 4D]
        return P(*lead, None, MODEL_AXIS)
    if leaf == "bias" and module == "c_fc":
        return P(*((None,) * (nd - 1)), MODEL_AXIS)
    if leaf == "kernel" and module == "c_proj":        # [..., 4D, D]
        return P(*lead, MODEL_AXIS, None)
    return P()


def param_shardings(mesh: Mesh, params):
    """Pytree of NamedShardings for the params: TP placement when the mesh
    has a model axis > 1, fully replicated otherwise."""
    tp = mesh.shape[MODEL_AXIS]

    def spec(path, leaf):
        if tp <= 1:
            return NamedSharding(mesh, P())
        names = [getattr(p, "key", getattr(p, "name", str(p)))
                 for p in path]
        return NamedSharding(mesh, _param_spec(names, np.shape(leaf)))

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(mesh: Mesh, params):
    """device_put the param tree with TP/replicated placement."""
    shardings = param_shardings(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


# ---------------------------------------------------------------------------
# ZeRO-1: optimizer-state sharding over the data axis
# ---------------------------------------------------------------------------

def zero_opt_shardings(mesh: Mesh, opt_state):
    """Pytree of NamedShardings that shards the optimizer moments over the
    ``data`` axis (ZeRO stage 1).

    The reference replicates its BertAdam m/v on every GPU (DDP semantics,
    main_task_retrieval.py:207). On TPU the moments are pure per-parameter
    state with no cross-example coupling, so each leaf's first
    dp-divisible dimension is sharded over the data axis: optimizer-state
    HBM drops ~dp-fold and the BertAdam moment update runs on 1/dp of the
    elements per chip. XLA lowers the constrained update to exactly the
    ZeRO-1 schedule — sharded m/v update followed by an all-gather of the
    (parameter-sized) update tensors — from the sharding annotation alone;
    no hand-written collectives.

    Scalars (step counters) and leaves with no dp-divisible dimension stay
    replicated. Under tensor parallelism the moment sharding is chosen
    independently of the param placement (XLA inserts the resharding);
    correctness is unchanged.
    """
    dp = mesh.shape[DATA_AXIS]

    def spec(leaf) -> NamedSharding:
        shape = np.shape(leaf)
        if dp > 1:
            for i, s in enumerate(shape):
                if s % dp == 0 and s > 0:
                    names = [None] * len(shape)
                    names[i] = DATA_AXIS
                    return NamedSharding(mesh, P(*names))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, opt_state)


def shard_opt_state(mesh: Mesh, opt_state):
    """device_put the optimizer state with ZeRO-1 placement."""
    shardings = zero_opt_shardings(mesh, opt_state)
    return jax.tree_util.tree_map(jax.device_put, opt_state, shardings), \
        shardings
