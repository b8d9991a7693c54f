"""Retrieval evaluation (reference: eval_epoch,
main_task_retrieval.py:360-525).

Two phases, both device-side:

1. Feature caching — jitted text/visual encoders over fixed-shape batches
   (the last partial batch is zero-padded and trimmed). Multi-sentence
   datasets (VATEX) encode every sentence but only the videos at the
   cut-off indices (main_task_retrieval.py:401-419).
2. Similarity — the reference shards the sim matrix across GPUs with
   thread-replicated models (util.py:23-62); here it is a handful of
   device einsums, blocked over queries so the [Q, V, F] per-frame logits
   never materialize beyond a block (memory note in SURVEY §7).

Composition: ``sim = loose_similarity(q, v) [+ topk-mean frame sim if
use_frame_fea]`` then rank metrics via :func:`hmmc_tpu.metrics.logging_rank`
(t2v + v2t, multi-sentence grouping with -inf padding).
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hmmc_tpu.config import TaskConfig
from hmmc_tpu.metrics import logging_rank
from hmmc_tpu.ops import image_ops

logger = logging.getLogger(__name__)


def _pad_to(x: np.ndarray, n: int) -> np.ndarray:
    if x.shape[0] == n:
        return x
    pad = np.zeros((n - x.shape[0], *x.shape[1:]), x.dtype)
    return np.concatenate([x, pad], axis=0)


class Evaluator:
    def __init__(self, model, task: TaskConfig, query_block: int = 512,
                 weight_title: float = 0.5):
        self.model = model
        self.task = task
        self.query_block = query_block
        self.weight_title = weight_title

        def encode_text(params, ids, mask):
            return model.apply({"params": params}, ids, mask,
                               method="encode_text")

        def encode_video(params, video_u8):
            video = image_ops.normalize(image_ops.to_float(video_u8))
            return model.apply({"params": params}, video,
                               method="encode_video")

        self._encode_text = jax.jit(encode_text)
        self._encode_video = jax.jit(encode_video)

        @jax.jit
        def block_sims(q, v, frames, scale):
            qn = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
            vn = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
            sim = scale * qn @ vn.T
            fn = frames / jnp.linalg.norm(frames, axis=-1, keepdims=True)
            # [Q, V, F] frame logits for this query block
            fl = scale * jnp.einsum("qh,vfh->qvf", qn, fn)
            k = min(self.task.top_frames, fl.shape[-1])
            top = jax.lax.top_k(fl, k)[0]
            sim_frame = jnp.mean(top, axis=-1)
            return sim, sim_frame

        self._block_sims = block_sims

    # ------------------------------------------------------------------

    def cache_features(self, params, loader, dataset):
        multi = bool(getattr(dataset, "multi_sentence_per_video", False))
        cut_off = ([c - 1 for c in dataset.cut_off_points] if multi else [])
        is_vt = self.task.task == "retrieval_VT"

        q_list, v_list, f_list, t_list = [], [], [], []
        total_video = 0
        batch_size = loader.batch_size
        for batch in loader:
            ids = _pad_to(batch["query_ids"], batch_size)
            mask = _pad_to(batch["query_mask"], batch_size)
            n = batch["query_ids"].shape[0]
            q = np.asarray(self._encode_text(params, ids, mask))[:n]
            q_list.append(q)
            if is_vt and "title_ids" in batch:
                tids = _pad_to(batch["title_ids"], batch_size)
                tmask = _pad_to(batch["title_mask"], batch_size)
                t = np.asarray(self._encode_text(params, tids, tmask))[:n]
                t_list.append(t)
            if multi:
                s_, e_ = total_video, total_video + n
                keep = [i - s_ for i in cut_off if s_ <= i < e_]
                if keep:
                    vid = batch["video"][keep]
                    vid = _pad_to(vid, batch_size)
                    v, f = self._encode_video(params, vid)
                    v_list.append(np.asarray(v)[:len(keep)])
                    f_list.append(np.asarray(f)[:len(keep)])
                total_video += n
            else:
                vid = _pad_to(batch["video"], batch_size)
                v, f = self._encode_video(params, vid)
                v_list.append(np.asarray(v)[:n])
                f_list.append(np.asarray(f)[:n])

        q = np.concatenate(q_list, axis=0)
        v = np.concatenate(v_list, axis=0)
        f = np.concatenate(f_list, axis=0)
        t = np.concatenate(t_list, axis=0) if t_list else None
        return q, v, f, t, multi, cut_off

    def similarity(self, params, q: np.ndarray, v: np.ndarray,
                   f: np.ndarray, t=None) -> np.ndarray:
        scale = jnp.minimum(
            jnp.exp(params["text_encoder"]["logit_scale"]), 100.0)
        v_dev = jnp.asarray(v)
        f_dev = jnp.asarray(f)
        blocks = []
        frame_blocks = []
        qb = self.query_block
        nq = q.shape[0]
        for s in range(0, nq, qb):
            qblk = _pad_to(q[s:s + qb], qb)
            sim, sim_frame = self._block_sims(
                jnp.asarray(qblk), v_dev, f_dev, scale)
            n = min(qb, nq - s)
            blocks.append(np.asarray(sim)[:n])
            frame_blocks.append(np.asarray(sim_frame)[:n])
        sim = np.concatenate(blocks, axis=0)
        if self.task.use_frame_fea:
            sim = sim + np.concatenate(frame_blocks, axis=0)
        if t is not None:
            # retrieval_VT: mix the query-vs-title similarity
            # (main_task_retrieval.py:516-518; weight_title is a config
            # field here, undefined in the reference)
            qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
            tn = t / np.linalg.norm(t, axis=-1, keepdims=True)
            sim_title = float(np.asarray(scale)) * (qn @ tn.T)
            sim = sim + self.weight_title * sim_title
        return sim

    def run(self, params, loader, dataset,
            log: Optional[logging.Logger] = None) -> Dict[str, float]:
        q, v, f, t, multi, cut_off = self.cache_features(params, loader,
                                                         dataset)
        logger.info("eval features: %d queries, %d videos", len(q), len(v))
        sim = self.similarity(params, q, v, f, t)
        return logging_rank(sim, multi, cut_off, log or logger)
