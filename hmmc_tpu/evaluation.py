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

from hmmc_tpu import losses
from hmmc_tpu.config import TaskConfig
from hmmc_tpu.metrics import logging_rank
from hmmc_tpu.ops import image_ops

logger = logging.getLogger(__name__)


def _pad_to(x: np.ndarray, n: int) -> np.ndarray:
    if x.shape[0] == n:
        return x
    pad = np.zeros((n - x.shape[0], *x.shape[1:]), x.dtype)
    return np.concatenate([x, pad], axis=0)


def auto_video_block(arch, frames: int, budget_bytes: float = 2.5e9) -> int:
    """Geometry-aware eval encode block: the largest power of two <= 64
    whose fp32 attention probabilities [B*F, H, L, L] fit ``budget_bytes``.

    The probabilities are the block's peak live tensor — at ViT-L/14@336px
    the old fixed block of 64 demanded a single 16.4 GB alloc
    (f32[768,16,577,577]) and could never compile on a 16 GB chip (the
    round-4 ">25 min eval-encode stall"; root-caused round 5, the
    allocator line is in docs/design.md). The budget leaves headroom for
    weights + the rest of the live set; block 8 at @336 (2.0 GB) is the
    measured-working recipe (18.3 clips/s, docs/serving.md)."""
    if arch.is_resnet:
        return 64
    seq = arch.grid_size ** 2 + 1
    heads = arch.vision_heads
    b = 64
    while b > 1 and b * frames * heads * seq * seq * 4.0 > budget_bytes:
        b //= 2
    return b


class _BlockedEncoder:
    """Accumulates host rows and runs a jitted encoder over FIXED-size
    blocks, padding only the final partial block.

    This bounds the device footprint of feature caching by the block size
    — NOT by ``--batch_size_val`` (default 3500), which at MSR-VTT eval
    geometry would otherwise push a [3500, 12, 224, 224, 3] tensor through
    the ViT (~25 GB). The reference instead shards eval rows across GPUs
    (util.py:23-62); fixed blocks are the single-program equivalent."""

    def __init__(self, fn, block: int):
        self.fn = fn
        self.block = block
        self.bufs = None
        self.n = 0
        self.outs = []

    def add(self, *arrays: np.ndarray) -> None:
        if self.bufs is None:
            self.bufs = [[] for _ in arrays]
        for buf, a in zip(self.bufs, arrays):
            buf.append(np.asarray(a))
        self.n += arrays[0].shape[0]
        while self.n >= self.block:
            self._compact()
            blk = [c[:self.block] for c in self._cat]
            self._run(blk, self.block)
            self._cat = [c[self.block:] for c in self._cat]
            self.bufs = [[c] for c in self._cat]
            self.n -= self.block

    def _compact(self) -> None:
        self._cat = [b[0] if len(b) == 1 else np.concatenate(b, axis=0)
                     for b in self.bufs]

    def _run(self, blk, n_valid: int) -> None:
        out = self.fn(*blk)
        if not isinstance(out, (tuple, list)):
            out = (out,)
        self.outs.append(tuple(np.asarray(o)[:n_valid] for o in out))

    def finish(self):
        """Returns a tuple of concatenated outputs (empty tuple if no rows
        were added)."""
        if self.n:
            self._compact()
            self._run([_pad_to(c, self.block) for c in self._cat], self.n)
            self.bufs, self.n = None, 0
        if not self.outs:
            return ()
        width = len(self.outs[0])
        return tuple(np.concatenate([o[i] for o in self.outs], axis=0)
                     for i in range(width))


class Evaluator:
    def __init__(self, model, task: TaskConfig, query_block: int = 512,
                 weight_title: float = 0.5, text_block: int = 512,
                 video_block: Optional[int] = None, mesh=None):
        """``mesh``: when given (and this is a single-process run over a
        >1-device ``data`` axis), eval blocks are batch-sharded over the
        mesh and the params replicated, so feature caching and the
        blocked sim einsums use EVERY chip — the single-program
        equivalent of the reference's thread-replicated multi-GPU eval
        (util.py:23-62, main_task_retrieval.py:448-477). Without a mesh
        the blocks run on the default device."""
        self.model = model
        self.task = task
        self.query_block = query_block
        self.weight_title = weight_title
        self.text_block = text_block
        if video_block is None:
            video_block = auto_video_block(model.arch, task.max_frames)
            logger.info("eval video block auto-sized to %d "
                        "(seq %s, %d frames)", video_block,
                        "RN" if model.arch.is_resnet
                        else model.arch.grid_size ** 2 + 1,
                        task.max_frames)
        self.video_block = video_block

        self._bshard = self._rep = None
        if (mesh is not None and jax.process_count() == 1
                and mesh.shape.get("data", 1) > 1):
            from hmmc_tpu.parallel import batch_sharding, replicated

            self._dp = mesh.shape["data"]
            self._bshard = batch_sharding(mesh)
            self._rep = replicated(mesh)

        def encode_text(variables, ids, mask):
            return model.apply(variables, ids, mask, method="encode_text")

        tf_keep = int(getattr(task, "token_filter_keep", 0) or 0)
        if tf_keep > 0:
            # attention-aware token filtering (ops/token_filter.py):
            # eval/extract feature computation only — same params, pruned
            # per-frame ViT. Guarded to 2d-patch ViT towers.
            from hmmc_tpu.ops import token_filter

            if model.arch.is_resnet or model.arch.linear_patch == "3d":
                raise ValueError(
                    "--token_filter_keep supports 2d-patch ViT towers only")

            def encode_video(variables, video_u8):
                video = image_ops.normalize(image_ops.to_float(video_u8))
                return token_filter.encode_video_filtered(
                    variables, video, model.arch, model.cross_config,
                    model.use_temp, task.token_filter_layer, tf_keep,
                    dtype=model.dtype,
                    use_pallas=getattr(model, "use_pallas", False))
        else:
            def encode_video(variables, video_u8):
                video = image_ops.normalize(image_ops.to_float(video_u8))
                return model.apply(variables, video, method="encode_video")

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

    def _place_block(self, x):
        """Shard a fixed-size block over the data axis (when mesh-enabled
        and the block divides); plain jnp otherwise."""
        x = np.asarray(x)
        if self._bshard is not None and x.shape[0] % self._dp == 0:
            return jax.device_put(x, self._bshard)
        return jnp.asarray(x)

    def _place_rep(self, tree):
        if self._rep is not None:
            return jax.device_put(tree, self._rep)
        return jax.device_put(tree)

    # ------------------------------------------------------------------

    def cache_features(self, params, loader, dataset, batch_stats=None):
        multi = bool(getattr(dataset, "multi_sentence_per_video", False))
        cut_off = ([c - 1 for c in dataset.cut_off_points] if multi else [])
        is_vt = self.task.task == "retrieval_VT"

        var = {"params": params}
        if batch_stats:  # ResNet towers: frozen BN running stats at eval
            var["batch_stats"] = batch_stats
        # factory.build_model returns HOST numpy variables (cheap overlay
        # merging); pin them to device once — otherwise every blocked
        # encoder call re-uploads the full tower weights (~600 MB for
        # ViT-B/32, ~10 s per call through a remote-attached chip).
        # Mesh-enabled: replicated params + data-sharded blocks spread
        # each block's rows over every chip.
        var = self._place_rep(var)
        q_enc = _BlockedEncoder(
            lambda i, m: self._encode_text(
                var, self._place_block(i), self._place_block(m)),
            self.text_block)
        t_enc = _BlockedEncoder(
            lambda i, m: self._encode_text(
                var, self._place_block(i), self._place_block(m)),
            self.text_block)
        v_enc = _BlockedEncoder(
            lambda v: self._encode_video(var, self._place_block(v)),
            self.video_block)

        total_video = 0
        for batch in loader:
            n = batch["query_ids"].shape[0]
            q_enc.add(batch["query_ids"], batch["query_mask"])
            if is_vt and "title_ids" in batch:
                t_enc.add(batch["title_ids"], batch["title_mask"])
            if multi:
                # encode only the videos at the cut-off indices
                # (main_task_retrieval.py:401-419)
                s_ = total_video
                keep = [i - s_ for i in cut_off if s_ <= i < s_ + n]
                if keep:
                    v_enc.add(batch["video"][keep])
                total_video += n
            else:
                v_enc.add(batch["video"])

        (q,) = q_enc.finish()
        v, f = v_enc.finish()
        t_out = t_enc.finish()
        t = t_out[0] if t_out else None
        return q, v, f, t, multi, cut_off

    def similarity(self, params, q: np.ndarray, v: np.ndarray,
                   f: np.ndarray, t=None) -> np.ndarray:
        # numpy so the scalar stays uncommitted (mixing a device-0 scalar
        # with mesh-sharded query blocks would be a placement conflict)
        scale = np.minimum(np.exp(np.asarray(
            params["text_encoder"]["logit_scale"], np.float32)), 100.0)
        v_dev = self._place_rep(jnp.asarray(v))
        f_dev = self._place_rep(jnp.asarray(f))
        blocks = []
        frame_blocks = []
        qb = self.query_block
        nq = q.shape[0]
        for s in range(0, nq, qb):
            qblk = _pad_to(q[s:s + qb], qb)
            sim, sim_frame = self._block_sims(
                self._place_block(qblk), v_dev, f_dev, jnp.float32(scale))
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
        if getattr(self.task, "eval_dual_softmax", False):
            # opt-in inference-time dual-softmax reweighting, reusing the
            # training loss's get_dual_matrix (until_module.py:39-49 —
            # there it is train-loss only) so the formula can't drift
            sim = np.asarray(losses.get_dual_matrix(jnp.asarray(sim)))
        return sim

    def run(self, params, loader, dataset,
            log: Optional[logging.Logger] = None,
            batch_stats=None) -> Dict[str, float]:
        q, v, f, t, multi, cut_off = self.cache_features(
            params, loader, dataset, batch_stats)
        logger.info("eval features: %d queries, %d videos", len(q), len(v))
        sim = self.similarity(params, q, v, f, t)
        return logging_rank(sim, multi, cut_off, log or logger)
