"""Dataset classes (reference: dataloaders/dataloader_{msrvtt,vatex,bird}*).

Each dataset is an indexable host-side object returning a dict of numpy
arrays per sample. Video frames are decoded (and geometry-prepared) on the
host to FIXED-SIZE uint8; all float work — normalize / SimCLR augmentation —
runs on device (hmmc_tpu.ops.image_ops). Two host decode modes:

- ``eval``: JPEG -> RGB -> resize short side to `resolution` (PIL bicubic,
  matching torchvision's Resize) -> center crop. Device only normalizes.
- ``aug``: JPEG -> RGB -> resize short side to `aug_size` (cv2, fast) ->
  center crop square. Device runs RandomResizedCrop/jitter/blur/flip.

Sampling and text semantics are the reference's (see
hmmc_tpu.data.sampling / hmmc_tpu.data.text).
"""

from __future__ import annotations

import json
import os
import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from hmmc_tpu.data.framepack import open_frame_store
from hmmc_tpu.data.sampling import dynamic_frame_count, sample_frame_indices
from hmmc_tpu.data.text import (
    QUERY_MAX_WORDS, TAG_MAX_WORDS, TITLE_MAX_WORDS, encode_text)


# ---------------------------------------------------------------------------
# host frame decode
# ---------------------------------------------------------------------------

def _decode_eval(blob, resolution: int) -> np.ndarray:
    """PIL path: parity with torchvision Resize(bicubic)+CenterCrop
    (dataloader_msrvtt_retrieval.py:242-247). Corrupt frames zero-fill
    with a warning (the native decoder does the same) instead of killing
    the epoch."""
    import io
    import logging

    from PIL import Image

    try:
        img = Image.open(io.BytesIO(bytes(blob))).convert("RGB")
    except Exception:
        logging.getLogger(__name__).warning(
            "corrupt JPEG frame (zero-filled)")
        return np.zeros((resolution, resolution, 3), np.uint8)
    w, h = img.size
    if w <= h:
        nw, nh = resolution, max(resolution, round(h * resolution / w))
    else:
        nw, nh = max(resolution, round(w * resolution / h)), resolution
    img = img.resize((nw, nh), Image.BICUBIC)
    left = (nw - resolution) // 2
    top = (nh - resolution) // 2
    img = img.crop((left, top, left + resolution, top + resolution))
    return np.asarray(img, np.uint8)


def _decode_aug(blob, size: int) -> np.ndarray:
    """cv2 path: fast decode for the augmented (pretrain) pipeline.
    Corrupt frames zero-fill with a warning."""
    import cv2
    import logging

    buf = np.frombuffer(bytes(blob), np.uint8)
    bgr = cv2.imdecode(buf, cv2.IMREAD_COLOR)
    if bgr is None:
        logging.getLogger(__name__).warning(
            "corrupt JPEG frame (zero-filled)")
        return np.zeros((size, size, 3), np.uint8)
    rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    h, w = rgb.shape[:2]
    if w <= h:
        nw, nh = size, max(size, round(h * size / w))
    else:
        nw, nh = max(size, round(w * size / h)), size
    rgb = cv2.resize(rgb, (nw, nh), interpolation=cv2.INTER_AREA)
    top = (nh - size) // 2
    left = (nw - size) // 2
    return rgb[top:top + size, left:left + size]


class FrameSource:
    """Frame store + decode policy. ``key_prefix`` covers the bird datasets'
    "Video{docid}" keys (dataloader_bird.py:236).

    When the native batched decoder (native/hmmc_jpeg.cpp) is built, whole
    frame sets decode in one C call; otherwise the PIL (eval, torchvision
    bicubic parity) / cv2 (aug) per-frame paths run. ``use_native=None``
    auto-detects."""

    def __init__(self, store_path: str, frames_per_video: int = 30,
                 mode: str = "eval", resolution: int = 224,
                 aug_size: int = 256, key_prefix: str = "",
                 use_native: Optional[bool] = None):
        self.store = open_frame_store(store_path, frames_per_video)
        self.default_frames = frames_per_video
        self.mode = mode
        self.resolution = resolution
        self.aug_size = aug_size
        self.key_prefix = key_prefix
        self.out_size = resolution if mode == "eval" else aug_size
        if use_native is None:
            from hmmc_tpu.data import jpeg_native

            # default native decode for training-side (aug) reads only:
            # eval keeps the PIL bicubic path for metric parity with the
            # reference's torchvision Resize
            use_native = mode != "eval" and jpeg_native.available()
        self.use_native = use_native

    def stored_frames(self, video_id: str) -> int:
        try:
            return self.store.num_frames(self.key_prefix + video_id)
        except KeyError:
            return self.default_frames

    def load(self, video_id: str, indices: Sequence[int]) -> np.ndarray:
        key = self.key_prefix + video_id
        blobs = self.store.get_frames(key, list(indices))
        if self.use_native:
            from hmmc_tpu.data import jpeg_native

            return jpeg_native.decode_batch(blobs, self.out_size,
                                            num_threads=1)
        dec = (_decode_eval if self.mode == "eval" else _decode_aug)
        return np.stack([dec(b, self.out_size) for b in blobs])


def _get_video(source: FrameSource, video_id: str, want: int,
               max_frames: int, frame_sample: str,
               rng: Optional[np.random.Generator]) -> Tuple[np.ndarray, int]:
    """Sample+decode `want` frames, zero-pad to max_frames
    (dataloader_bird.py:210-216)."""
    stored = source.stored_frames(video_id)
    idx = sample_frame_indices(stored, want, frame_sample, rng)
    frames = source.load(video_id, idx)
    if want < max_frames:
        pad = np.zeros((max_frames - want, *frames.shape[1:]), np.uint8)
        frames = np.concatenate([frames, pad], axis=0)
    return frames, want


class SeededFrameSampling:
    """Deterministic frame-sampling RNG for train datasets.

    The reference seeds every RNG globally (main_task_retrieval.py:100-110)
    so frame sampling is reproducible; a single shared np.Generator can't
    give that here because loader worker threads interleave draws in
    scheduler order. Instead each sample derives its own generator from
    (seed, epoch, idx) — reproducible run-to-run, identical regardless of
    worker count, and fresh per epoch. BatchLoader.set_epoch threads
    (epoch, seed) through here.
    """

    _seed: int = 0
    _epoch: int = 0

    def set_epoch(self, epoch: int, seed: Optional[int] = None) -> None:
        self._epoch = int(epoch)
        if seed is not None:
            self._seed = int(seed)

    def _sample_rng(self, idx: int) -> np.random.Generator:
        return np.random.default_rng((self._seed, self._epoch, int(idx)))


# ---------------------------------------------------------------------------
# MSR-VTT
# ---------------------------------------------------------------------------

class MsrvttEvalDataset:
    """JSFUSION 1k-A test csv: one (sentence, video) pair per row
    (dataloader_msrvtt_retrieval.py:38-164)."""

    multi_sentence_per_video = False

    def __init__(self, source: FrameSource, csv_path: str, tokenizer,
                 max_words: int = 32, max_frames: int = 12,
                 frame_sample: str = "uniform", language: str = "english"):
        import pandas as pd

        self.data = pd.read_csv(csv_path)
        self.source = source
        self.tokenizer = tokenizer
        self.max_words = max_words
        self.max_frames = max_frames
        self.frame_sample = frame_sample
        self.language = language

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        row = self.data.iloc[idx]
        ids, mask = encode_text(self.tokenizer, row["sentence"],
                                self.max_words, self.language)
        video, nframes = _get_video(
            self.source, row["video_id"], self.max_frames, self.max_frames,
            self.frame_sample, None)
        return {"query_ids": ids, "query_mask": mask, "video": video,
                "nframes": np.int32(nframes), "idx": np.int32(idx)}


class MsrvttTrainDataset(SeededFrameSampling):
    """9k-split training sentences, unfolded: every (video, caption) pair is
    one sample (dataloader_msrvtt_retrieval.py:205-211)."""

    def __init__(self, source: FrameSource, csv_path: str, json_path: str,
                 tokenizer, max_words: int = 32, max_frames: int = 12,
                 frame_sample: str = "random", language: str = "english"):
        import pandas as pd

        csv = pd.read_csv(csv_path)
        train_ids = set(csv["video_id"].values)
        with open(json_path, "r", encoding="utf-8") as f:
            data = json.load(f)
        self.samples: List[Tuple[str, str]] = [
            (itm["video_id"], itm["caption"]) for itm in data["sentences"]
            if itm["video_id"] in train_ids]
        self.source = source
        self.tokenizer = tokenizer
        self.max_words = max_words
        self.max_frames = max_frames
        self.frame_sample = frame_sample
        self.language = language

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        video_id, caption = self.samples[idx]
        ids, mask = encode_text(self.tokenizer, caption, self.max_words,
                                self.language)
        video, nframes = _get_video(
            self.source, video_id, self.max_frames, self.max_frames,
            self.frame_sample, self._sample_rng(idx))
        return {"query_ids": ids, "query_mask": mask, "video": video,
                "nframes": np.int32(nframes), "idx": np.int32(idx)}


# ---------------------------------------------------------------------------
# VATEX (multi-sentence)
# ---------------------------------------------------------------------------

class VatexDataset(SeededFrameSampling):
    """Multi-sentence loader (dataloader_vatex_retrieval.py): every caption
    is a sample; ``cut_off_points`` mark each video's last sentence index+1;
    eval groups sentences per video (metrics.py:102-119)."""

    multi_sentence_per_video = True

    def __init__(self, source: FrameSource, data_path: str, subset: str,
                 tokenizer, language: str = "english", max_words: int = 32,
                 max_frames: int = 12, frame_sample: str = "uniform",
                 list_path: str = None):
        """``list_path`` overrides the split list location (the registry
        falls back to the manifests bundled under tools/vatex_txt/ when the
        data dir lacks them — the reference ships the same lists)."""
        list_file = {"pretrain": "train_list.txt", "train": "train_list.txt",
                     "val": "val_list.txt", "test": "test_list.txt"}[subset]
        with open(list_path or os.path.join(data_path, list_file), "r",
                  encoding="utf-8") as f:
            video_ids = [l.strip() for l in f if l.strip()]
        with open(os.path.join(data_path, "vatex_data.json"), "r",
                  encoding="utf-8") as f:
            captions = json.load(f)
        cap_key = "chCap" if language == "chinese" else "enCap"
        self.samples: List[Tuple[str, str]] = []
        self.cut_off_points: List[int] = []
        for vid in video_ids:
            for cap in captions[vid][cap_key]:
                self.samples.append((vid, cap))
            self.cut_off_points.append(len(self.samples))
        self.video_num = len(video_ids)
        self.sentence_num = len(self.samples)
        self.video_ids = video_ids
        self.source = source
        self.tokenizer = tokenizer
        self.language = language
        self.max_words = max_words
        self.max_frames = max_frames
        self.frame_sample = frame_sample

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        video_id, caption = self.samples[idx]
        ids, mask = encode_text(self.tokenizer, caption, self.max_words,
                                self.language)
        video, nframes = _get_video(
            self.source, video_id, self.max_frames, self.max_frames,
            self.frame_sample, self._sample_rng(idx))
        return {"query_ids": ids, "query_mask": mask, "video": video,
                "nframes": np.int32(nframes), "idx": np.int32(idx)}


# ---------------------------------------------------------------------------
# CHVTT / bird
# ---------------------------------------------------------------------------

def read_json_line(path: str) -> List[dict]:
    out = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def flat_query_list(query_list: List[dict]) -> List[dict]:
    """Unfold (query, videolist) into per-(query, video) items
    (dataloader_bird.py:57-73)."""
    flat = []
    for itm in query_list:
        for positem in itm["videolist"]:
            flat.append({
                "query": itm["query"], "query_eng": itm["query_eng"],
                "docid": positem["docid"], "title": positem["title"],
                "title_eng": positem["title_eng"],
                "duration": positem["duration"]})
    return flat


class BirdPretrainDataset(SeededFrameSampling):
    """CHVTT pretrain items: tag+title text pairs, dynamic frame count
    duration*0.3 (dataloader_bird.py:76-253)."""

    def __init__(self, source: FrameSource, json_path: str, tokenizer,
                 language: str = "chinese", max_frames: int = 12,
                 frame_sample: str = "uniform",
                 frame_sample_len: str = "fix"):
        self.datalist = read_json_line(json_path)
        self.source = source
        self.tokenizer = tokenizer
        self.language = language
        self.max_frames = max_frames
        self.frame_sample = frame_sample
        self.frame_sample_len = frame_sample_len

    def __len__(self):
        return len(self.datalist)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        item = self.datalist[idx]
        if self.frame_sample_len == "dynamic":
            want = dynamic_frame_count(item["duration"], self.max_frames)
        else:
            want = self.max_frames
        video, nframes = _get_video(
            self.source, item["docid"], want, self.max_frames,
            self.frame_sample, self._sample_rng(idx))
        if self.language == "chinese":
            tag, title = item["tag"], item["title"]
        else:
            tag, title = item["tag_eng"], item["title_eng"]
        tag_ids, tag_mask = encode_text(self.tokenizer, tag, TAG_MAX_WORDS,
                                        self.language)
        title_ids, title_mask = encode_text(
            self.tokenizer, title, TITLE_MAX_WORDS, self.language)
        return {"video": video, "nframes": np.int32(nframes),
                "tag_ids": tag_ids, "tag_mask": tag_mask,
                "title_ids": title_ids, "title_mask": title_mask}


class BirdValDataset:
    """CHVTT eval: one (query, first positive video) pair per item
    (dataload_bird_val, dataloader_bird.py:434-589); emits the title too
    for the retrieval_VT task."""

    multi_sentence_per_video = False

    def __init__(self, source: FrameSource, json_path: str, tokenizer,
                 language: str = "chinese", max_frames: int = 12,
                 frame_sample_len: str = "fix", include_title: bool = False):
        self.datalist = read_json_line(json_path)
        self.source = source
        self.tokenizer = tokenizer
        self.language = language
        self.max_frames = max_frames
        self.frame_sample_len = frame_sample_len
        self.include_title = include_title

    def __len__(self):
        return len(self.datalist)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        item = self.datalist[idx]
        pos = item["videolist"][0]
        if self.frame_sample_len == "dynamic":
            want = min(max(int(pos["duration"] * 0.5), 3), self.max_frames)
        else:
            want = self.max_frames
        video, nframes = _get_video(
            self.source, pos["docid"], want, self.max_frames, "uniform",
            None)
        zh = self.language == "chinese"
        query = item["query"] if zh else item["query_eng"]
        ids, mask = encode_text(self.tokenizer, query, QUERY_MAX_WORDS,
                                self.language)
        out = {"query_ids": ids, "query_mask": mask, "video": video,
               "nframes": np.int32(nframes), "idx": np.int32(idx)}
        if self.include_title:
            title = pos["title"] if zh else pos["title_eng"]
            tids, tmask = encode_text(self.tokenizer, title,
                                      TITLE_MAX_WORDS, self.language)
            out["title_ids"], out["title_mask"] = tids, tmask
        return out


class BirdDebugTestDataset(BirdValDataset):
    """Debug split capped at 1000 samples with duration*0.3 dynamic frames
    (dataload_bird_debug_test, dataloader_bird.py:592-760; registered as
    'debug_test' like the reference's DATALOADER_DICT entry)."""

    CAP = 1000

    def __init__(self, *args, **kw):
        super().__init__(*args, **kw)
        self.datalist = self.datalist[:self.CAP]

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        item = self.datalist[idx]
        pos = item["videolist"][0]
        if self.frame_sample_len == "dynamic":
            want = dynamic_frame_count(pos["duration"], self.max_frames)
        else:
            want = self.max_frames
        video, nframes = _get_video(
            self.source, pos["docid"], want, self.max_frames, "uniform",
            None)
        zh = self.language == "chinese"
        query = item["query"] if zh else item["query_eng"]
        ids, mask = encode_text(self.tokenizer, query, QUERY_MAX_WORDS,
                                self.language)
        out = {"query_ids": ids, "query_mask": mask, "video": video,
               "nframes": np.int32(nframes), "idx": np.int32(idx)}
        if self.include_title:
            title = pos["title"] if zh else pos["title_eng"]
            tids, tmask = encode_text(self.tokenizer, title,
                                      TITLE_MAX_WORDS, self.language)
            out["title_ids"], out["title_mask"] = tids, tmask
        return out


class BirdTrainDataset(SeededFrameSampling):
    """CHVTT fine-tune: (query, video) pairs unfolded from the query list;
    dynamic frames use duration*0.5 here (dataloader_bird.py:405-411).
    ``include_title`` adds the positive title text (retrieval_VT)."""

    def __init__(self, source: FrameSource, json_path: str, tokenizer,
                 language: str = "chinese", max_frames: int = 12,
                 frame_sample: str = "random",
                 frame_sample_len: str = "fix",
                 include_title: bool = False):
        self.include_title = include_title
        self.datalist = flat_query_list(read_json_line(json_path))
        self.source = source
        self.tokenizer = tokenizer
        self.language = language
        self.max_frames = max_frames
        self.frame_sample = frame_sample
        self.frame_sample_len = frame_sample_len

    def __len__(self):
        return len(self.datalist)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        item = self.datalist[idx]
        if self.frame_sample_len == "dynamic":
            want = min(max(int(item["duration"] * 0.5), 3), self.max_frames)
        else:
            want = self.max_frames
        video, nframes = _get_video(
            self.source, item["docid"], want, self.max_frames,
            self.frame_sample, self._sample_rng(idx))
        zh = self.language == "chinese"
        query = item["query"] if zh else item["query_eng"]
        ids, mask = encode_text(self.tokenizer, query, QUERY_MAX_WORDS,
                                self.language)
        out = {"query_ids": ids, "query_mask": mask, "video": video,
               "nframes": np.int32(nframes), "idx": np.int32(idx)}
        if self.include_title:
            title = item["title"] if zh else item["title_eng"]
            tids, tmask = encode_text(self.tokenizer, title,
                                      TITLE_MAX_WORDS, self.language)
            out["title_ids"], out["title_mask"] = tids, tmask
        return out
