"""Native training-state checkpoints (Orbax).

The reference saves model weights only (``pytorch_model.bin.{epoch}``,
main_task_retrieval.py:215-222) and silently restarts the optimizer schedule
on resume (SURVEY §5). Here the FULL state — params, momentum towers, BN
stats, optimizer moments, MoCo queues, step — round-trips, so resume is
exact. :func:`save_reference_checkpoint` additionally exports weights in the
reference's torch naming for interop.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _manager(directory: str, max_to_keep: int = 5):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True))


def save_state(directory: str, state: Any, step: int,
               max_to_keep: int = 5) -> None:
    import orbax.checkpoint as ocp

    with _manager(directory, max_to_keep) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()


class CheckpointWriter:
    """Long-lived checkpoint writer with optional non-blocking saves.

    ``save_state`` opens a manager per call and blocks until the write is
    durable — correct, but at large model sizes the serialization + disk
    write sits on the training loop's critical path (the reference blocks
    the loop in ``torch.save`` too, main_task_retrieval.py:215-222).
    With ``async_save=True`` the device->host snapshot is taken
    synchronously (a REAL copy — the training step donates its input
    buffers, so the state must be materialized off-device before the
    next step reuses them; on the CPU backend ``np.array`` is what
    forces the copy, since host "transfers" can alias) and the
    serialization/commit runs on orbax's background thread, overlapping
    the next train steps. ``close()`` drains outstanding commits.
    """

    def __init__(self, directory: str, max_to_keep: int = 5,
                 async_save: bool = False):
        self._mgr = _manager(directory, max_to_keep)
        self._dir = directory
        self._async = async_save

    def save(self, step: int, state: Any,
             meta: Optional[dict] = None) -> None:
        import orbax.checkpoint as ocp

        if self._async:
            snapshot = jax.tree_util.tree_map(
                lambda a: np.array(a), state)
        else:
            snapshot = state
        self._mgr.save(step, args=ocp.args.StandardSave(snapshot))
        if not self._async:
            self._mgr.wait_until_finished()
        if meta is not None:
            # the sidecar may exist for an uncommitted step after a crash
            # mid-async-save; readers key off latest_step(), which only
            # reports committed steps, so a stray meta file is inert
            save_progress_meta(self._dir, step, meta)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def latest_step(directory: str) -> Optional[int]:
    import orbax.checkpoint as ocp

    if not os.path.isdir(directory):
        return None
    with _manager(directory) as mgr:
        return mgr.latest_step()


def restore_state(directory: str, template: Any,
                  step: Optional[int] = None) -> Any:
    """Restore into the structure/shardings of ``template`` (an abstract or
    concrete state pytree)."""
    import orbax.checkpoint as ocp

    with _manager(directory) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {directory}")
        return mgr.restore(step, args=ocp.args.StandardRestore(template))


def save_progress_meta(directory: str, step: int, meta: dict) -> None:
    """Sidecar (epoch, batch_in_epoch) record for exact mid-epoch resume
    (the reference loses optimizer state AND position entirely on resume,
    main_task_retrieval.py:215-222). Lives next to — not inside — the
    orbax step dirs so the checkpoint layout stays orbax-standard."""
    import json

    d = os.path.join(os.path.abspath(directory), "progress_meta")
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f"{step}.json.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(d, f"{step}.json"))


def load_progress_meta(directory: str, step: int) -> Optional[dict]:
    import json

    path = os.path.join(os.path.abspath(directory), "progress_meta",
                        f"{step}.json")
    if not os.path.isfile(path):
        return None
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)


def restore_raw(directory: str, step: Optional[int] = None) -> Any:
    """Restore a checkpoint as a plain nested dict (no template) — used by
    the factory to pull just ``params`` out of a full training-state
    checkpoint when ``--init_model`` points at an Orbax directory."""
    with _manager(directory) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {directory}")
        return mgr.restore(step)


def _export_text_tower(te: Any, sd: dict, prefix: str,
                       language: str) -> None:
    from hmmc_tpu.train.checkpoint import export_clip_text, export_hf_bert

    if "logit_scale" in te:
        sd[f"{prefix}logit_scale"] = np.asarray(te["logit_scale"])
    if language == "english" and "clip_text" in te:
        export_clip_text(te["clip_text"], sd, prefix=prefix)
    elif "chinese_encoder" in te:
        export_hf_bert(te["chinese_encoder"], sd,
                       prefix=f"{prefix}chinese_encoder.")
        sd[f"{prefix}text_proj.weight"] = np.ascontiguousarray(
            np.asarray(te["text_proj"]["kernel"]).T)
        sd[f"{prefix}text_proj.bias"] = np.asarray(te["text_proj"]["bias"])


def _export_visual_tower(ve: Any, sd: dict, prefix: str,
                         batch_stats: Any = None) -> None:
    from hmmc_tpu.train.checkpoint import (_export_resblocks,
                                           export_clip_resnet,
                                           export_clip_visual)

    if "attnpool" in ve["visual"]:  # ModifiedResNet tower
        stats = (batch_stats or {}).get("visual_encoder", {}).get(
            "visual", {})
        export_clip_resnet(ve["visual"], stats, sd,
                           prefix=f"{prefix}visual.")
    else:
        export_clip_visual(ve["visual"], sd, prefix=f"{prefix}visual.")
    if "frame_position_embeddings" in ve:
        sd[f"{prefix}frame_position_embeddings.weight"] = (
            ve["frame_position_embeddings"])
        inner: dict = {}
        _export_resblocks(ve["temporal_transformer"],
                          "temporal_transformer", inner)
        sd.update({f"{prefix}{k}": v for k, v in inner.items()})


def save_reference_checkpoint(path: str, params: Any,
                              language: str = "english",
                              pretrain_state: Any = None,
                              batch_stats: Any = None) -> None:
    """Write a torch state dict in the reference's naming so checkpoints
    flow back to the PyTorch implementation (inverse of
    checkpoint.import_hmmc_state_dict).

    With ``pretrain_state`` (a PretrainState), the momentum ``*_k``
    towers, projector/predictor MLPs (+BN running stats), MLM head, and
    the MoCo queues/ptr are exported too — the reference keeps all of
    these as registered buffers/modules in its pretrain state_dict
    (modeling.py:88-157), so a reference run can resume from them.
    """
    import torch

    from hmmc_tpu.train.checkpoint import export_mlm_head, export_mlp

    params = jax.tree_util.tree_map(np.asarray, params)
    if pretrain_state is not None and batch_stats is None:
        batch_stats = pretrain_state.batch_stats
    if batch_stats:
        batch_stats = jax.tree_util.tree_map(np.asarray, batch_stats)
    sd: dict = {}
    _export_text_tower(params["text_encoder"], sd, "text_encoder.",
                       language)
    _export_visual_tower(params["visual_encoder"], sd, "visual_encoder.",
                         batch_stats)

    if pretrain_state is not None:
        st = jax.tree_util.tree_map(np.asarray, pretrain_state)
        pk = st.params_k
        _export_text_tower(pk["text_encoder"], sd, "text_encoder_k.",
                           language)
        # key visual BN stats (RN towers) are the shared frozen query-side
        # copy — see trainer.key_forwards
        _export_visual_tower(pk["visual_encoder"], sd, "visual_encoder_k.",
                             batch_stats)
        for tower, tree, stats in (
                ("t_projector", params.get("t_projector"),
                 st.batch_stats.get("t_projector")),
                ("v_projector", params.get("v_projector"),
                 st.batch_stats.get("v_projector")),
                ("v_predictor", params.get("v_predictor"),
                 st.batch_stats.get("v_predictor")),
                ("t_projector_k", pk.get("t_projector"),
                 st.batch_stats_k.get("t_projector")),
                ("v_projector_k", pk.get("v_projector"),
                 st.batch_stats_k.get("v_projector"))):
            if tree is not None:
                export_mlp(tree, stats or {}, sd, prefix=f"{tower}.")
        if "cls" in params:
            export_mlm_head(params["cls"], sd, prefix="cls.")
        q = st.queues
        sd.update({
            "queue_v_cross_ng": q.v_cross,
            "queue_frame_proj_ng": q.frame_proj,
            "queue_frame_cross_ng": q.frame_cross,
            "queue_title_cross_ng": q.title_cross,
            "queue_tag_cross_ng": q.tag_cross,
            "queue_ptr": np.asarray([int(q.ptr)], dtype=np.int64),
        })

    # atomic write: a crash mid-save must not leave a corrupt file under
    # the final name
    tmp = path + ".tmp"
    # np.array copies, making the buffer writable (jax arrays are
    # read-only views; torch.from_numpy warns on them)
    torch.save({k: torch.from_numpy(np.array(v))
                for k, v in sd.items()}, tmp)
    os.replace(tmp, path)
