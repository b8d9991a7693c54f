"""Raw-video frame extraction (reference: dataloaders/rawvideo_util.py).

cv2.VideoCapture seek/read at a target framerate, short-side resize +
center crop to fixed uint8 squares (float work happens on device). Frame
order transforms (reverse / shuffle) match RawVideoExtractorCV2's
process_frame_order (rawvideo_util.py:93-105).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class RawVideoExtractor:
    def __init__(self, framerate: float = 1.0, size: int = 224):
        self.framerate = framerate
        self.size = size

    def _resize_crop(self, frame_bgr: np.ndarray) -> np.ndarray:
        import cv2

        rgb = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2RGB)
        h, w = rgb.shape[:2]
        s = self.size
        if w <= h:
            nw, nh = s, max(s, round(h * s / w))
        else:
            nw, nh = max(s, round(w * s / h)), s
        rgb = cv2.resize(rgb, (nw, nh), interpolation=cv2.INTER_CUBIC)
        top, left = (nh - s) // 2, (nw - s) // 2
        return rgb[top:top + s, left:left + s]

    def extract(self, video_path: str, start_time: Optional[float] = None,
                end_time: Optional[float] = None,
                sample_fp: int = 0) -> np.ndarray:
        """-> uint8 [T, size, size, 3]; samples `sample_fp` frames per
        second (0 = every frame at native fps), within [start, end]
        (rawvideo_util.py:20-80 semantics)."""
        import cv2

        cap = cv2.VideoCapture(video_path)
        fps = int(cap.get(cv2.CAP_PROP_FPS))
        n_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        if fps <= 0 or n_frames <= 0:
            cap.release()
            return np.zeros((0, self.size, self.size, 3), np.uint8)
        duration = n_frames / fps
        start = 0.0 if start_time is None else max(0.0, start_time)
        end = duration if end_time is None else min(duration, end_time)
        if start > end:
            start, end = end, start
        cap.set(cv2.CAP_PROP_POS_FRAMES, int(start * fps))
        per_sec = sample_fp if sample_fp > 0 else fps
        interval = max(1, fps // per_sec)
        keep = list(range(0, fps, interval))[:per_sec]

        frames = []
        total = int((end - start) * fps)
        for i in range(total):
            ret, frame = cap.read()
            if not ret:
                break
            if (i % fps) in keep:
                frames.append(self._resize_crop(frame))
        cap.release()
        if not frames:
            return np.zeros((0, self.size, self.size, 3), np.uint8)
        return np.stack(frames)

    @staticmethod
    def process_frame_order(frames: np.ndarray, frame_order: int = 0,
                            rng: Optional[np.random.Generator] = None
                            ) -> np.ndarray:
        """0: as-is; 1: reversed; 2: shuffled (rawvideo_util.py:93-105)."""
        if frame_order == 1:
            return frames[::-1]
        if frame_order == 2:
            rng = rng or np.random.default_rng()
            return frames[rng.permutation(len(frames))]
        return frames


def slice_frames(frames: np.ndarray, max_frames: int,
                 slice_framepos: int = 2) -> np.ndarray:
    """0: head; 1: tail; 2: uniform (the reference's slice_framepos
    contract, dataloader_msvd_retrieval.py:36-38)."""
    if len(frames) <= max_frames:
        return frames
    if slice_framepos == 0:
        return frames[:max_frames]
    if slice_framepos == 1:
        return frames[-max_frames:]
    idx = np.linspace(0, len(frames) - 1, num=max_frames, dtype=int)
    return frames[idx]
