"""CLI driver shared by main_task_retrieval.py and main_pretrain.py.

Flag surface preserves the reference's names
(main_task_retrieval.py:33-97, main_pretrain.py:33-100) so launch commands
port over; DDP flags (--local_rank/--rank/--world_size/--n_gpu) are accepted
and ignored (one logical JAX program replaces per-rank processes), and
--enable_amp is accepted but superseded by bf16-on-TPU (--compute_dtype).

TPU-native extras: --clip_model (local ViT-B-32.pt path — the reference
auto-downloads it), --dp_size, --compute_dtype, --use_pallas_attention.
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import Optional

import numpy as np

from hmmc_tpu.config import TaskConfig

logger = logging.getLogger(__name__)


def get_args(description: str = "HMMC-TPU on Retrieval Task",
             argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--do_pretrain", action="store_true")
    p.add_argument("--do_train", action="store_true")
    p.add_argument("--do_eval", action="store_true")
    p.add_argument("--do_params", action="store_true")
    p.add_argument("--do_extract", action="store_true",
                   help="encode the eval split to features.npz under "
                        "output_dir (offline retrieval / serving; consumed "
                        "by tools/retrieve.py)")
    p.add_argument("--quantize_bank", type=str, default="none",
                   choices=["none", "int8"],
                   help="with --do_extract: store the video-side features "
                        "int8-quantized (4x smaller bank; MXU s8 ranking "
                        "path — see hmmc_tpu/ops/quant.py)")
    p.add_argument("--use_frame_fea", action="store_true")
    p.add_argument("--task", type=str, default="retrieval",
                   choices=["retrieval_VT", "retrieval"])
    p.add_argument("--dataset", type=str, default="bird",
                   choices=["bird", "msrvtt", "vatex", "msvd", "lsmdc"])
    p.add_argument("--num_thread_reader", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--text_lr", type=float, default=1e-5)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--batch_size_val", type=int, default=3500)
    p.add_argument("--lr_decay", type=float, default=0.9)
    p.add_argument("--weight_decay", type=float, default=0.2)
    p.add_argument("--n_display", type=int, default=100)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--max_words", type=int, default=32)
    p.add_argument("--max_frames", type=int, default=12)
    p.add_argument("--top_frames", type=int, default=3)
    p.add_argument("--frame_sample", type=str, default="uniform",
                   choices=["uniform", "random", "uniform_random"])
    p.add_argument("--frame_sample_len", type=str, default="fix",
                   choices=["dynamic", "fix"])
    p.add_argument("--language", type=str, default="chinese",
                   choices=["chinese", "english"])
    p.add_argument("--use_temp", action="store_true")
    p.add_argument("--logdir", default=None, type=str)
    p.add_argument("--output_dir", default=None, type=str, required=True)
    p.add_argument("--cross_model", default="cross-base", type=str)
    p.add_argument("--init_model", default=None, type=str)
    p.add_argument("--warmup_proportion", default=0.1, type=float)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--cache_dir", default="", type=str)
    p.add_argument("--enable_amp", action="store_true",
                   help="accepted for compat; bf16 is the TPU default")
    # accepted-and-ignored DDP flags
    p.add_argument("--n_gpu", type=int, default=1)
    p.add_argument("--world_size", default=0, type=int)
    p.add_argument("--local_rank", default=0, type=int)
    p.add_argument("--rank", default=0, type=int)
    p.add_argument("--coef_lr", type=float, default=1.0)
    # pretrain contrast flags (main_pretrain.py:61-63)
    p.add_argument("--contrast_num_negative", type=int, default=1024)
    p.add_argument("--contrast_momentum", type=float, default=0.99)
    p.add_argument("--contrast_temperature", type=float, default=0.07)
    # TPU-native extras
    p.add_argument("--data_dir", default=None, type=str,
                   help="root of frame stores + annotations")
    p.add_argument("--clip_model", default=None, type=str,
                   help="local path of OpenAI ViT-B-32.pt")
    p.add_argument("--pretrained_text", default="hfl/chinese-roberta-wwm-ext",
                   type=str)
    p.add_argument("--compute_dtype", default="bfloat16", type=str,
                   choices=["bfloat16", "float32"])
    p.add_argument("--dp_size", type=int, default=0)
    p.add_argument("--tp_size", type=int, default=1,
                   help="tensor-parallel shards (Megatron-style placement "
                        "over the mesh's model axis)")
    p.add_argument("--sp_size", type=int, default=1,
                   help="frame-axis sequence-parallel shards (video sharded "
                        "[B/dp, F/sp, ...]; max_frames %% sp_size must be 0)")
    p.add_argument("--dcn_dp_size", type=int, default=1,
                   help="multi-slice: slice-granules the data axis spans "
                        "over DCN (mesh laid out slice-major so seq/model "
                        "collectives stay on ICI; dp_size stays the TOTAL "
                        "data shards)")
    p.add_argument("--use_pallas_attention", nargs="?", const="on",
                   default="auto", choices=["auto", "on", "off"],
                   help="fused Pallas attention kernel: 'auto' (default) "
                        "picks it when the ViT patch sequence reaches the "
                        "measured crossover (ViT-L/14@336px territory, "
                        "+27-33%%) and the XLA path below it; bare flag "
                        "= 'on'")
    p.add_argument("--optim_bf16_state", action="store_true",
                   help="store BertAdam m/v moments in bf16 (fp32 math, "
                        "bf16 carry): halves optimizer-state HBM traffic, "
                        "+2-3% step throughput; off = exact reference "
                        "optimizer state")
    p.add_argument("--zero_opt", action="store_true",
                   help="ZeRO-1: shard BertAdam m/v moments over the data "
                        "axis — optimizer-state HBM drops ~dp-fold per "
                        "chip; numerics unchanged (the reference "
                        "replicates optimizer state on every GPU)")
    p.add_argument("--fused_ema", action="store_true",
                   help="pretrain: run the momentum EMA fused with the "
                        "BertAdam parameter write (exactly equal "
                        "fresh-run trajectory; keep consistent across "
                        "--resume)")
    p.add_argument("--eval_dual_softmax", action="store_true",
                   help="apply the dual-softmax reweighting "
                        "(until_module.py get_dual_matrix) to the eval "
                        "similarity matrix — an inference-time R@1 "
                        "booster; off = reference eval behavior")
    p.add_argument("--token_filter_keep", type=int, default=0,
                   help="eval/extract only: keep this many ViT tokens "
                        "(incl. CLS) after --token_filter_layer blocks, "
                        "ranked by CLS attention (attention-aware token "
                        "filtering, arXiv 2506.01519). 0 = off; training "
                        "always runs the full tower")
    p.add_argument("--token_filter_layer", type=int, default=4,
                   help="ViT block count run before token filtering")
    p.add_argument("--use_randaugment", action="store_true",
                   help="stack device-side RandAugment(N, M) on the "
                        "pretrain SimCLR aug (the reference imports "
                        "RandomAugment but never wires it)")
    p.add_argument("--randaugment_n", type=int, default=2)
    p.add_argument("--randaugment_m", type=int, default=10)
    p.add_argument("--use_frame_mask", action="store_true",
                   help="mask zero-padded frames in the temporal "
                        "transformer (fixes a reference quirk; off = "
                        "reference behavior)")
    p.add_argument("--resume", action="store_true",
                   help="resume full state from output_dir (TPU extra; the "
                        "reference restarts schedules)")
    p.add_argument("--save_steps", type=int, default=0,
                   help="also checkpoint full state every N steps "
                        "(restart-based failure recovery; 0 = per-epoch "
                        "only like the reference)")
    p.add_argument("--async_save", action="store_true",
                   help="non-blocking checkpoints: snapshot to host "
                        "synchronously, serialize+commit on a background "
                        "thread so train steps overlap the write")
    p.add_argument("--profile_dir", default=None, type=str,
                   help="capture a jax.profiler trace of the first training "
                        "steps into this directory (TensorBoard-viewable)")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() for multi-host "
                        "TPU slices (replaces torch.distributed.launch)")
    return p.parse_args(argv)


def to_task_config(args: argparse.Namespace) -> TaskConfig:
    fields = {f.name for f in TaskConfig.__dataclass_fields__.values()}
    kv = {k: v for k, v in vars(args).items() if k in fields}
    task = TaskConfig(**kv)
    task.validate()
    return task


def setup_logging(output_dir: Optional[str]) -> logging.Logger:
    """util.get_logger parity (util.py:64-75): console + output_dir/log.txt."""
    handlers = [logging.StreamHandler()]
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        handlers.append(logging.FileHandler(
            os.path.join(output_dir, "log.txt")))
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(levelname)s: %(message)s",
        handlers=handlers, force=True)
    return logging.getLogger("hmmc_tpu")


def set_seed(seed: int) -> None:
    import random

    random.seed(seed)
    np.random.seed(seed)


def make_tokenizer(task: TaskConfig):
    if task.language == "chinese":
        from hmmc_tpu.tokenization.wordpiece import load_bert_tokenizer

        return load_bert_tokenizer(task.pretrained_text)
    from hmmc_tpu.tokenization import ClipTokenizer

    return ClipTokenizer()


class MetricsWriter:
    """Scalar logging (replaces tensorboardX; uses tf.summary when
    available, else JSONL)."""

    def __init__(self, logdir: Optional[str]):
        self._tf = None
        self._jsonl = None
        if not logdir:
            return
        os.makedirs(logdir, exist_ok=True)
        try:
            import tensorflow as tf

            self._tf = tf.summary.create_file_writer(logdir)
        except Exception:
            self._jsonl = open(os.path.join(logdir, "scalars.jsonl"), "a")

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._tf is not None:
            import tensorflow as tf

            with self._tf.as_default():
                tf.summary.scalar(tag, value, step=step)
        elif self._jsonl is not None:
            import json

            self._jsonl.write(json.dumps(
                {"tag": tag, "value": float(value), "step": step}) + "\n")
            self._jsonl.flush()

    def close(self):
        if self._jsonl is not None:
            self._jsonl.close()
