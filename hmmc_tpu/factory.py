"""Model construction + weight initialization (reference: init_model,
main_task_retrieval.py:149-168 -> from_pretrained, modeling.py:48-67).

Construction order mirrors the reference:
1. fresh module init;
2. overlay OpenAI CLIP weights (the reference always builds its towers from
   ``ViT-B-32.pt``, module_clip.py:418-439; here the path comes from
   ``--clip_model`` / task.clip_model since there is no network fetch);
3. for ``--language chinese`` without a full checkpoint, overlay pretrained
   RoBERTa weights onto the Chinese text tower from a LOCAL HF checkpoint
   (``--pretrained_text`` as a directory/file path). The reference does
   ``AutoModel.from_pretrained("hfl/chinese-roberta-wwm-ext")`` at build
   (module_cross.py:260-265); there is no network fetch here, so a hub name
   that is not a local path logs a warning and leaves the tower at random
   init;
4. overlay a user checkpoint (``--init_model``): either a reference torch
   ``pytorch_model.bin.*`` (imported via the name map) or a native Orbax
   checkpoint directory (the ``ckpt/`` tree written by the runner, or the
   output_dir containing it).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hmmc_tpu.config import ClipArch, CrossConfig, TaskConfig
from hmmc_tpu.models.pretrain import BirdPretrainModel
from hmmc_tpu.models.retrieval import BirdModel, BirdModelVT
from hmmc_tpu.train import checkpoint as ckpt

logger = logging.getLogger(__name__)


def _init_variables(model, task: TaskConfig, arch: ClipArch,
                    pretrain: bool) -> Dict:
    rng = jax.random.PRNGKey(task.seed)
    ids = jnp.zeros((1, task.max_words), jnp.int32)
    mask = jnp.ones((1, task.max_words), jnp.int32)
    video = jnp.zeros(
        (1, task.max_frames, arch.image_resolution, arch.image_resolution,
         3), jnp.float32)
    if pretrain:
        return model.init(rng, ids, mask, video)
    return model.init(rng, ids, mask, video)


def _resolve_hf_checkpoint(path: Optional[str]) -> Optional[str]:
    """A local HF checkpoint: either the weights file itself or a directory
    containing pytorch_model.bin. Hub names (no local file) resolve to
    None — this environment has no network fetch."""
    if not path:
        return None
    if os.path.isfile(path) and path.endswith((".bin", ".pt", ".pth")):
        # a weights file directly (pretrained_text may instead be a bare
        # vocab.txt, which only feeds the tokenizer)
        return path
    if os.path.isdir(path):
        cand = os.path.join(path, "pytorch_model.bin")
        if os.path.isfile(cand):
            return cand
    return None


def _resolve_orbax_dir(path: str) -> Optional[str]:
    """An --init_model directory: the runner's ckpt/ tree itself or an
    output_dir containing one."""
    from hmmc_tpu.train import orbax_io

    for cand in (path, os.path.join(path, "ckpt")):
        if os.path.isdir(cand) and orbax_io.latest_step(cand) is not None:
            return cand
    return None


def build_model(task: TaskConfig, cross: CrossConfig,
                vocab_size: int = 49408,
                clip_model_path: Optional[str] = None,
                init_model_path: Optional[str] = None,
                pretrain: bool = False) -> Tuple[Any, Dict]:
    """Returns (module, variables)."""
    sd: Optional[Dict[str, Any]] = None
    if clip_model_path:
        # The reference never consults a name table: every architecture
        # hyperparameter is sniffed from the checkpoint's tensor shapes
        # (build_model, module_clip.py:530-579). pretrained_clip_name only
        # selects WHICH checkpoint to download there; here --clip_model
        # already names the file, so the shapes are authoritative.
        sd = ckpt.load_torch_state_dict(clip_model_path)
        arch = ClipArch.from_state_dict(sd)
        logger.info(
            "CLIP arch from checkpoint shapes: embed_dim=%d res=%d "
            "vision_layers=%s width=%d patch=%s",
            arch.embed_dim, arch.image_resolution, arch.vision_layers,
            arch.vision_width, arch.vision_patch_size or None)
    else:
        arch = ClipArch.by_name(cross.pretrained_clip_name)
    dtype = jnp.bfloat16 if task.compute_dtype == "bfloat16" else jnp.float32
    from hmmc_tpu.config import (PALLAS_AUTO_MIN_SEQ,
                                 approx_vit_param_count,
                                 resolve_use_pallas)

    # per-chip TRAIN batch for the memory-envelope branch of auto
    # selection (only meaningful when a train step will actually run)
    per_chip_b = 0
    if task.do_train or task.do_pretrain:
        dp = task.dp_size
        if not dp:
            try:
                dp = max(1, jax.device_count())
            except Exception:
                dp = 1
        per_chip_b = max(1, task.micro_batch_size // max(dp, 1))
    use_pallas = resolve_use_pallas(
        task.use_pallas_attention, arch, batch_per_chip=per_chip_b,
        frames=task.max_frames,
        param_count=0 if arch.is_resnet else approx_vit_param_count(
            arch, cross.temporal_hidden_layers))
    if task.use_pallas_attention == "auto" and use_pallas:
        seq = arch.grid_size ** 2 + 1
        why = (f"patch sequence {seq} >= {PALLAS_AUTO_MIN_SEQ}, the "
               "measured win geometry" if seq >= PALLAS_AUTO_MIN_SEQ
               else "step footprint near the HBM envelope — the kernel "
                    "never materializes the [L, L] attention tensors")
        logger.info(
            "auto-selected the Pallas fused attention kernel (%s — "
            "--use_pallas_attention off forces the XLA path)", why)
    common = dict(
        arch=arch, cross_config=cross, language=task.language,
        use_temp=task.use_temp, dtype=dtype, use_pallas=use_pallas)
    if task.language == "chinese":
        # size the Chinese tower's embedding by the actual tokenizer vocab
        # (21128 for the stock BERT vocab; tiny in tests)
        common["chinese_vocab_size"] = vocab_size
    if pretrain:
        model = BirdPretrainModel(vocab_size=vocab_size, **common)
    elif task.task == "retrieval_VT":
        model = BirdModelVT(**common)
    else:
        model = BirdModel(**common)

    variables = _init_variables(model, task, arch, pretrain)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    params = variables["params"]

    if sd is not None:
        visual, text, logit_scale, visual_stats = ckpt.import_clip_weights(
            sd)
        imported: Dict[str, Any] = {
            "visual_encoder": {"visual": visual},
            "text_encoder": {"logit_scale": logit_scale},
        }
        if task.language == "english":
            imported["text_encoder"]["clip_text"] = text
        params = ckpt.merge_params(params, imported, logger)
        if visual_stats:
            # ModifiedResNet towers carry BN running stats
            variables.setdefault("batch_stats", {})
            variables["batch_stats"] = ckpt.merge_params(
                variables["batch_stats"],
                {"visual_encoder": {"visual": visual_stats}}, logger)
        logger.info("loaded CLIP weights from %s", clip_model_path)

    if task.language == "chinese":
        # pretrained RoBERTa into the Chinese tower
        # (module_cross.py:260-265). A full --init_model overlay follows
        # and wins, matching the reference's load-then-init_preweight order.
        bert_path = _resolve_hf_checkpoint(task.pretrained_text)
        if bert_path:
            sd = ckpt.load_torch_state_dict(bert_path)
            bert = ckpt.import_hf_bert(sd)
            params = ckpt.merge_params(
                params, {"text_encoder": {"chinese_encoder": bert}}, logger)
            logger.info("loaded pretrained Chinese text tower from %s",
                        bert_path)
        else:
            logger.warning(
                "pretrained_text %r is not a local HF checkpoint; the "
                "Chinese text tower starts from RANDOM init (the reference "
                "downloads hfl/chinese-roberta-wwm-ext — place its "
                "pytorch_model.bin locally and pass the path)",
                task.pretrained_text)

    if init_model_path:
        orbax_dir = (os.path.isdir(init_model_path)
                     and _resolve_orbax_dir(init_model_path))
        if orbax_dir:
            from hmmc_tpu.train import orbax_io

            restored = orbax_io.restore_raw(orbax_dir)
            params = ckpt.merge_params(params, restored["params"], logger)
            if "batch_stats" in restored and "batch_stats" in variables:
                variables["batch_stats"] = ckpt.merge_params(
                    variables["batch_stats"], restored["batch_stats"],
                    logger)
            logger.info("loaded native Orbax checkpoint %s", orbax_dir)
        else:
            sd = ckpt.load_torch_state_dict(init_model_path)
            imported = ckpt.import_hmmc_state_dict(
                sd, language=task.language, use_temp=task.use_temp,
                pretrain=pretrain, proj_num_layers=cross.proj_num_layers,
                pred_num_layers=cross.pred_num_layers)
            if pretrain:
                # momentum twins / queue buffers live OUTSIDE the module
                # params here (PretrainState); stash them for the runner
                # (the reference keeps them in the one state_dict,
                # modeling.py:88-157)
                extras: Dict[str, Any] = {}
                pk: Dict[str, Any] = {}
                for src, dst in (("text_encoder_k", "text_encoder"),
                                 ("visual_encoder_k", "visual_encoder"),
                                 ("t_projector_k", "t_projector"),
                                 ("v_projector_k", "v_projector")):
                    if src in imported["params"]:
                        pk[dst] = imported["params"].pop(src)
                if pk:
                    extras["params_k"] = pk
                stats = imported.get("batch_stats", {})
                bsk: Dict[str, Any] = {}
                for src, dst in (("t_projector_k", "t_projector"),
                                 ("v_projector_k", "v_projector")):
                    if src in stats:
                        bsk[dst] = stats.pop(src)
                if bsk:
                    extras["batch_stats_k"] = bsk
                if "queues" in imported:
                    extras["queues"] = imported["queues"]
                if extras:
                    variables["_pretrain_import"] = extras
            params = ckpt.merge_params(params, imported["params"], logger)
            if "batch_stats" in imported and "batch_stats" in variables:
                variables["batch_stats"] = ckpt.merge_params(
                    variables["batch_stats"], imported["batch_stats"],
                    logger)
            logger.info("loaded checkpoint %s", init_model_path)

    variables["params"] = params
    return model, variables


def count_params(params) -> int:
    return int(sum(np.prod(np.shape(p))
                   for p in jax.tree_util.tree_leaves(params)))
