"""Model construction + weight initialization (reference: init_model,
main_task_retrieval.py:149-168 -> from_pretrained, modeling.py:48-67).

Construction order mirrors the reference:
1. fresh module init;
2. overlay OpenAI CLIP weights (the reference always builds its towers from
   ``ViT-B-32.pt``, module_clip.py:418-439; here the path comes from
   ``--clip_model`` / task.clip_model since there is no network fetch);
3. overlay a user checkpoint (``--init_model``): either a reference torch
   ``pytorch_model.bin.*`` (imported via the name map) or a native Orbax
   directory.
"""

from __future__ import annotations

import logging
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


def build_model(task: TaskConfig, cross: CrossConfig,
                vocab_size: int = 49408,
                clip_model_path: Optional[str] = None,
                init_model_path: Optional[str] = None,
                pretrain: bool = False) -> Tuple[Any, Dict]:
    """Returns (module, variables)."""
    arch = ClipArch.by_name(cross.pretrained_clip_name)
    dtype = jnp.bfloat16 if task.compute_dtype == "bfloat16" else jnp.float32
    common = dict(
        arch=arch, cross_config=cross, language=task.language,
        use_temp=task.use_temp, dtype=dtype,
        use_pallas=task.use_pallas_attention)
    if pretrain:
        model = BirdPretrainModel(vocab_size=vocab_size, **common)
    elif task.task == "retrieval_VT":
        model = BirdModelVT(**common)
    else:
        model = BirdModel(**common)

    variables = _init_variables(model, task, arch, pretrain)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    params = variables["params"]

    if clip_model_path:
        sd = ckpt.load_torch_state_dict(clip_model_path)
        visual, text, logit_scale = ckpt.import_clip_weights(sd)
        imported: Dict[str, Any] = {
            "visual_encoder": {"visual": visual},
            "text_encoder": {"logit_scale": logit_scale},
        }
        if task.language == "english":
            imported["text_encoder"]["clip_text"] = text
        params = ckpt.merge_params(params, imported, logger)
        logger.info("loaded CLIP weights from %s", clip_model_path)

    if init_model_path:
        sd = ckpt.load_torch_state_dict(init_model_path)
        imported = ckpt.import_hmmc_state_dict(
            sd, language=task.language, use_temp=task.use_temp,
            pretrain=pretrain, proj_num_layers=cross.proj_num_layers,
            pred_num_layers=cross.pred_num_layers)
        params = ckpt.merge_params(params, imported["params"], logger)
        if "batch_stats" in imported and "batch_stats" in variables:
            variables["batch_stats"] = ckpt.merge_params(
                variables["batch_stats"], imported["batch_stats"], logger)
        logger.info("loaded checkpoint %s", init_model_path)

    variables["params"] = params
    return model, variables


def count_params(params) -> int:
    return int(sum(np.prod(np.shape(p))
                   for p in jax.tree_util.tree_leaves(params)))
