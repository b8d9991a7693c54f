"""MSVD and LSMDC raw-video datasets (reference:
dataloader_msvd_retrieval.py / dataloader_lsmdc_retrieval.py — present in
the reference but NOT registered in its DATALOADER_DICT, so selecting them
crashed at main_task_retrieval.py:565; here they are wired into the
registry — a knowingly-fixed reference gap, SURVEY §7).

Both read frames directly from video files via RawVideoExtractor (no
FramePack needed), pad to max_frames, and support multi-sentence eval via
cut_off_points like VATEX.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Tuple

import numpy as np

from hmmc_tpu.data.rawvideo import RawVideoExtractor, slice_frames
from hmmc_tpu.data.text import encode_text


def _index_video_files(features_path: str, wanted: set) -> Dict[str, str]:
    out = {}
    for root, _dirs, files in os.walk(features_path):
        for f in files:
            vid = ".".join(f.split(".")[:-1])
            if vid in wanted:
                out[vid] = os.path.join(root, f)
    return out


class _RawVideoRetrievalDataset:
    multi_sentence_per_video = True

    def __init__(self, samples: List[Tuple[str, str]],
                 cut_off_points: List[int], video_dict: Dict[str, str],
                 tokenizer, max_words: int, max_frames: int,
                 resolution: int, language: str = "english",
                 slice_framepos: int = 2):
        self.samples = samples
        self.cut_off_points = cut_off_points
        self.video_num = len(cut_off_points)
        self.sentence_num = len(samples)
        self.video_dict = video_dict
        self.tokenizer = tokenizer
        self.max_words = max_words
        self.max_frames = max_frames
        self.language = language
        self.slice_framepos = slice_framepos
        self.extractor = RawVideoExtractor(size=resolution)
        self.resolution = resolution

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        video_id, caption = self.samples[idx]
        ids, mask = encode_text(self.tokenizer, caption, self.max_words,
                                self.language)
        frames = self.extractor.extract(self.video_dict[video_id],
                                        sample_fp=1)
        frames = slice_frames(frames, self.max_frames, self.slice_framepos)
        n = len(frames)
        if n < self.max_frames:
            pad = np.zeros((self.max_frames - n, self.resolution,
                            self.resolution, 3), np.uint8)
            frames = (np.concatenate([frames, pad], axis=0)
                      if n else pad)
        return {"query_ids": ids, "query_mask": mask, "video": frames,
                "nframes": np.int32(max(n, 1)), "idx": np.int32(idx)}


class MsvdDataset(_RawVideoRetrievalDataset):
    """data_path: {train,val,test}_list.txt + raw-captions.pkl
    (dataloader_msvd_retrieval.py:41-72)."""

    def __init__(self, data_path: str, features_path: str, subset: str,
                 tokenizer, max_words: int = 32, max_frames: int = 12,
                 resolution: int = 224, **kw):
        with open(os.path.join(data_path, f"{subset}_list.txt"), "r",
                  encoding="utf-8") as f:
            video_ids = [l.strip() for l in f if l.strip()]
        with open(os.path.join(data_path, "raw-captions.pkl"), "rb") as f:
            captions = pickle.load(f)
        samples, cut_off = [], []
        for vid in video_ids:
            for cap in captions[vid]:
                samples.append((vid, " ".join(cap)))
            cut_off.append(len(samples))
        video_dict = _index_video_files(features_path, set(video_ids))
        super().__init__(samples, cut_off, video_dict, tokenizer, max_words,
                         max_frames, resolution, **kw)


class LsmdcDataset(_RawVideoRetrievalDataset):
    """LSMDC16 tab-separated annotation csvs
    (dataloader_lsmdc_retrieval.py:44-80)."""

    FILES = {"train": "LSMDC16_annos_training.csv",
             "val": "LSMDC16_annos_val.csv",
             "test": "LSMDC16_challenge_1000_publictect.csv"}

    def __init__(self, data_path: str, features_path: str, subset: str,
                 tokenizer, max_words: int = 32, max_frames: int = 12,
                 resolution: int = 224, **kw):
        pairs: List[Tuple[str, str]] = []
        with open(os.path.join(data_path, self.FILES[subset]), "r",
                  encoding="utf-8") as f:
            for line in f:
                parts = line.strip().split("\t")
                if len(parts) != 6:
                    continue
                clip_id, *_times, sentence = parts
                pairs.append((clip_id, sentence))
        video_ids = list(dict.fromkeys(vid for vid, _ in pairs))
        video_dict = _index_video_files(features_path, set(video_ids))
        # group sentences per clip for multi-sentence eval
        samples, cut_off = [], []
        by_vid: Dict[str, List[str]] = {}
        for vid, sent in pairs:
            if vid in video_dict:
                by_vid.setdefault(vid, []).append(sent)
        for vid, sents in by_vid.items():
            for s in sents:
                samples.append((vid, s))
            cut_off.append(len(samples))
        super().__init__(samples, cut_off, video_dict, tokenizer, max_words,
                         max_frames, resolution, **kw)
