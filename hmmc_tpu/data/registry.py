"""Dataset registry (reference: DATALOADER_DICT,
dataloaders/dataloader.py:172-177).

Factories take (task: TaskConfig, tokenizer) and return (BatchLoader,
dataset). Data roots are resolved from ``task.data_dir`` with the
reference's file layout:

    {data_dir}/
      frames.fpk | lmdb dir          — frame store
      msrvtt/MSRVTT_JSFUSION_test.1k.csv
      msrvtt/MSRVTT_train.9k.csv
      msrvtt/MSRVTT_data.json
      vatex/{train,val,test}_list.txt, vatex/vatex_data.json
      bird/{pretrain,query}.json

Unlike the reference, the data roots are NOT hard-coded absolute paths
(dataloader.py's /ai/swxdisk/... constants).
"""

from __future__ import annotations

import os
from typing import Callable, Dict

from hmmc_tpu.config import TaskConfig
from hmmc_tpu.data.datasets import (
    BirdDebugTestDataset, BirdPretrainDataset, BirdTrainDataset,
    BirdValDataset, FrameSource, MsrvttEvalDataset, MsrvttTrainDataset,
    VatexDataset)
from hmmc_tpu.data.loader import BatchLoader


def _store_path(task: TaskConfig, sub: str) -> str:
    base = task.data_dir or "."
    for cand in (os.path.join(base, sub, "frames.fpk"),
                 os.path.join(base, "frames.fpk"),
                 os.path.join(base, sub, "lmdb"),
                 os.path.join(base, "lmdb")):
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(
        f"no frame store under {base!r} (looked for frames.fpk / lmdb)")


def _source(task: TaskConfig, sub: str, mode: str,
            frames_per_video: int = 30, key_prefix: str = "") -> FrameSource:
    res = task.image_resolution or 224
    return FrameSource(
        _store_path(task, sub), frames_per_video=frames_per_video,
        mode=mode, resolution=res, aug_size=res * 8 // 7,  # 224 -> 256
        key_prefix=key_prefix)


def _loader(dataset, task: TaskConfig, train: bool) -> BatchLoader:
    # Train loaders shard each global batch across processes (multi-host
    # slices); eval stays global per process — the eval set is small and
    # the evaluator needs all features anyway.
    if train:
        import jax

        pi, pc = jax.process_index(), jax.process_count()
    else:
        pi, pc = 0, 1
    # Eval batch size only sets host feed granularity (the Evaluator
    # re-blocks on device, and multi-sentence cut-offs are global-index
    # based), so cap it: the reference default --batch_size_val 3500 would
    # stack a ~6 GB uint8 video batch on the host.
    bs = task.batch_size if train else min(task.batch_size_val, 512)
    return BatchLoader(
        dataset, batch_size=bs,
        shuffle=train, drop_last=train,
        num_workers=max(1, task.num_thread_reader), seed=task.seed,
        process_index=pi, process_count=pc)


def msrvtt_train(task: TaskConfig, tokenizer):
    base = os.path.join(task.data_dir or ".", "msrvtt")
    ds = MsrvttTrainDataset(
        _source(task, "msrvtt", "eval"),
        csv_path=os.path.join(base, "MSRVTT_train.9k.csv"),
        json_path=os.path.join(base, "MSRVTT_data.json"),
        tokenizer=tokenizer, max_words=task.max_words,
        max_frames=task.max_frames, frame_sample=task.frame_sample,
        language=task.language)
    return _loader(ds, task, train=True), ds


def msrvtt_test(task: TaskConfig, tokenizer):
    base = os.path.join(task.data_dir or ".", "msrvtt")
    ds = MsrvttEvalDataset(
        _source(task, "msrvtt", "eval"),
        csv_path=os.path.join(base, "MSRVTT_JSFUSION_test.1k.csv"),
        tokenizer=tokenizer, max_words=task.max_words,
        max_frames=task.max_frames, frame_sample="uniform",
        language=task.language)
    return _loader(ds, task, train=False), ds


_BUNDLED_VATEX_LISTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "tools", "vatex_txt")


def vatex_split(subset: str, train: bool):
    def factory(task: TaskConfig, tokenizer):
        base = os.path.join(task.data_dir or ".", "vatex")
        # the reference ships its VATEX split lists (tools/vatex_txt/,
        # 25991/1500/1500 ids); fall back to the bundled copies when the
        # data dir lacks them so an eval needs no undocumented files
        list_file = {"pretrain": "train_list.txt",
                     "train": "train_list.txt", "val": "val_list.txt",
                     "test": "test_list.txt"}[subset]
        list_path = None
        if not os.path.isfile(os.path.join(base, list_file)):
            cand = os.path.join(_BUNDLED_VATEX_LISTS, list_file)
            if os.path.isfile(cand):
                list_path = cand
        # pretrain decodes at aug geometry (256, no center-crop) like the
        # bird pretrain source, so the device-side RandomResizedCrop sees
        # the same crop-scale distribution on both pretrain datasets
        mode = "aug" if subset == "pretrain" else "eval"
        ds = VatexDataset(
            _source(task, "vatex", mode), data_path=base, subset=subset,
            tokenizer=tokenizer, language=task.language,
            max_words=task.max_words, max_frames=task.max_frames,
            frame_sample=task.frame_sample if train else "uniform",
            list_path=list_path)
        return _loader(ds, task, train=train), ds

    return factory


def vatex_pretrain(task: TaskConfig, tokenizer):
    """Pretrain over VATEX reuses captions as both tag and title
    (dataloader_vatex_retrieval.py:248-249): implemented by the pretrain
    batch builder duplicating the caption fields."""
    return vatex_split("pretrain", train=True)(task, tokenizer)


def bird_pretrain(task: TaskConfig, tokenizer):
    base = os.path.join(task.data_dir or ".", "bird")
    ds = BirdPretrainDataset(
        _source(task, "bird", "aug", frames_per_video=48,
                key_prefix="Video"),
        json_path=os.path.join(base, "pretrain.json"), tokenizer=tokenizer,
        language=task.language, max_frames=task.max_frames,
        frame_sample=task.frame_sample,
        frame_sample_len=task.frame_sample_len)
    return _loader(ds, task, train=True), ds


def bird_train(task: TaskConfig, tokenizer):
    base = os.path.join(task.data_dir or ".", "bird")
    ds = BirdTrainDataset(
        _source(task, "bird", "eval", frames_per_video=48,
                key_prefix="Video"),
        json_path=os.path.join(base, "query.json"), tokenizer=tokenizer,
        language=task.language, max_frames=task.max_frames,
        frame_sample=task.frame_sample,
        frame_sample_len=task.frame_sample_len,
        include_title=task.task == "retrieval_VT")
    return _loader(ds, task, train=True), ds


def bird_val(task: TaskConfig, tokenizer):
    base = os.path.join(task.data_dir or ".", "bird")
    json_path = os.path.join(base, "val.json")
    if not os.path.isfile(json_path):
        json_path = os.path.join(base, "query.json")
    ds = BirdValDataset(
        _source(task, "bird", "eval", frames_per_video=48,
                key_prefix="Video"),
        json_path=json_path, tokenizer=tokenizer, language=task.language,
        max_frames=task.max_frames,
        frame_sample_len=task.frame_sample_len,
        include_title=task.task == "retrieval_VT")
    return _loader(ds, task, train=False), ds


def bird_debug_test(task: TaskConfig, tokenizer):
    base = os.path.join(task.data_dir or ".", "bird")
    ds = BirdDebugTestDataset(
        _source(task, "bird", "eval", frames_per_video=48,
                key_prefix="Video"),
        json_path=os.path.join(base, "query.json"), tokenizer=tokenizer,
        language=task.language, max_frames=task.max_frames,
        frame_sample_len=task.frame_sample_len,
        include_title=task.task == "retrieval_VT")
    return _loader(ds, task, train=False), ds


def rawvideo_split(cls_name: str, subset: str, train: bool):
    """MSVD / LSMDC raw-video factories — wired here even though the
    reference leaves them unregistered (dataloader.py:172-177 gap)."""
    def factory(task: TaskConfig, tokenizer):
        from hmmc_tpu.data.datasets_rawvideo import LsmdcDataset, MsvdDataset

        cls = {"msvd": MsvdDataset, "lsmdc": LsmdcDataset}[cls_name]
        base = os.path.join(task.data_dir or ".", cls_name)
        ds = cls(data_path=base,
                 features_path=os.path.join(base, "videos"), subset=subset,
                 tokenizer=tokenizer, max_words=task.max_words,
                 max_frames=task.max_frames,
                 resolution=task.image_resolution or 224,
                 language=task.language)
        return _loader(ds, task, train=train), ds

    return factory


DATALOADER_DICT: Dict[str, Dict[str, Callable]] = {
    "msrvtt": {"train": msrvtt_train, "test": msrvtt_test},
    "vatex": {"pretrain": vatex_pretrain,
              "train": vatex_split("train", True),
              "val": vatex_split("val", False),
              "test": vatex_split("test", False)},
    "bird": {"pretrain": bird_pretrain, "train": bird_train,
             "val": bird_val, "test": bird_val,
             "debug_test": bird_debug_test},
    "msvd": {"train": rawvideo_split("msvd", "train", True),
             "val": rawvideo_split("msvd", "val", False),
             "test": rawvideo_split("msvd", "test", False)},
    "lsmdc": {"train": rawvideo_split("lsmdc", "train", True),
              "val": rawvideo_split("lsmdc", "val", False),
              "test": rawvideo_split("lsmdc", "test", False)},
}
