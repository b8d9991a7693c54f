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


def restore_raw(directory: str, step: Optional[int] = None) -> Any:
    """Restore a checkpoint as a plain nested dict (no template) — used by
    the factory to pull just ``params`` out of a full training-state
    checkpoint when ``--init_model`` points at an Orbax directory."""
    with _manager(directory) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {directory}")
        return mgr.restore(step)


def save_reference_checkpoint(path: str, params: Any,
                              language: str = "english") -> None:
    """Write a torch state dict in the reference's naming so checkpoints
    flow back to the PyTorch implementation (inverse of
    checkpoint.import_hmmc_state_dict)."""
    import torch

    from hmmc_tpu.train.checkpoint import export_clip_text, export_clip_visual

    params = jax.tree_util.tree_map(np.asarray, params)
    sd = {}
    te = params["text_encoder"]
    sd["text_encoder.logit_scale"] = np.asarray(te["logit_scale"])
    if language == "english" and "clip_text" in te:
        export_clip_text(te["clip_text"], sd, prefix="text_encoder.")
    elif "chinese_encoder" in te:
        from hmmc_tpu.train.checkpoint import export_hf_bert

        export_hf_bert(te["chinese_encoder"], sd,
                       prefix="text_encoder.chinese_encoder.")
        sd["text_encoder.text_proj.weight"] = np.ascontiguousarray(
            np.asarray(te["text_proj"]["kernel"]).T)
        sd["text_encoder.text_proj.bias"] = np.asarray(
            te["text_proj"]["bias"])
    ve = params["visual_encoder"]
    export_clip_visual(ve["visual"], sd, prefix="visual_encoder.visual.")
    if "frame_position_embeddings" in ve:
        sd["visual_encoder.frame_position_embeddings.weight"] = (
            ve["frame_position_embeddings"])
        from hmmc_tpu.train.checkpoint import _export_resblocks

        inner = {}
        _export_resblocks(ve["temporal_transformer"],
                          "temporal_transformer", inner)
        sd.update({f"visual_encoder.{k}": v for k, v in inner.items()})
    # atomic write: a crash mid-save must not leave a corrupt file under
    # the final name
    tmp = path + ".tmp"
    # np.array copies, making the buffer writable (jax arrays are
    # read-only views; torch.from_numpy warns on them)
    torch.save({k: torch.from_numpy(np.array(v))
                for k, v in sd.items()}, tmp)
    os.replace(tmp, path)
