"""Offline ingest: videos -> FramePack (reference: tools/frame2lmdb.py).

Improvements over the reference tool, preserving its contract (N uniformly
spaced frames per video, JPEG-encoded, failures pruned from the source
list):

- frames are RESIZED AT PACK TIME to a short side of ``store_size``
  (default 256): the reference stores original-resolution JPEGs and pays
  full-size decode + resize per training sample forever after
  (frame2lmdb.py:89 stores raw-size; dataloader decodes at :319-330);
- per-video frames are contiguous in the output file (see framepack.py);
- a process pool decodes/encodes; the writer runs in the parent.

Also: :func:`lmdb_to_framepack` converts reference-produced LMDBs.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from hmmc_tpu.data.framepack import FramePackWriter


def extract_video_frames(
    video_file: str,
    num_frames: int = 30,
    store_size: int = 256,
    jpeg_quality: int = 90,
    retry: int = 3,
) -> Optional[List[bytes]]:
    """cv2 seek/read/encode of `num_frames` uniform frames
    (frame2lmdb.py:29-106 semantics incl. the seek-retry with random
    jitter)."""
    import random

    import cv2

    if not os.path.exists(video_file):
        return None
    cap = cv2.VideoCapture(video_file)
    frame_count = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    fps = int(cap.get(cv2.CAP_PROP_FPS))
    if fps == 0 or frame_count == 0:
        cap.release()
        return None
    inds = np.linspace(0, max(frame_count - 10, 0), num=num_frames,
                       dtype=int)
    blobs: List[bytes] = []
    for ind in inds:
        cap.set(cv2.CAP_PROP_POS_FRAMES, int(ind))
        ret, frame = cap.read()
        for _ in range(retry):
            if ret:
                break
            jitter = random.randint(-fps, fps)
            cap.set(cv2.CAP_PROP_POS_FRAMES, int(ind) + jitter)
            ret, frame = cap.read()
        if not ret:
            cap.release()
            return None
        h, w = frame.shape[:2]
        if min(h, w) > store_size:
            if w <= h:
                nw, nh = store_size, round(h * store_size / w)
            else:
                nw, nh = round(w * store_size / h), store_size
            frame = cv2.resize(frame, (nw, nh),
                               interpolation=cv2.INTER_AREA)
        ok, enc = cv2.imencode(
            ".jpg", frame, [cv2.IMWRITE_JPEG_QUALITY, jpeg_quality])
        if not ok:
            cap.release()
            return None
        blobs.append(enc.tobytes())
    cap.release()
    return blobs


def _worker(args: Tuple[str, str, int, int]) -> Tuple[str, Optional[List[bytes]]]:
    video_id, path, num_frames, store_size = args
    return video_id, extract_video_frames(path, num_frames, store_size)


def videos_to_framepack(
    items: Sequence[Tuple[str, str]],
    out_path: str,
    num_frames: int = 30,
    store_size: int = 256,
    num_workers: int = 8,
    key_prefix: str = "",
) -> Tuple[List[str], List[str]]:
    """items: [(video_id, video_path)]. Returns (ok_ids, failed_ids);
    failures are dropped like the reference's json rewrite
    (frame2lmdb.py:186-195)."""
    import multiprocessing as mp

    ok_ids: List[str] = []
    failed: List[str] = []
    with FramePackWriter(out_path) as w:
        w.set_metadata(frames_per_video=num_frames, store_size=store_size)
        jobs = [(vid, path, num_frames, store_size) for vid, path in items]
        with mp.Pool(num_workers) as pool:
            for vid, blobs in pool.imap_unordered(_worker, jobs):
                if blobs is None:
                    failed.append(vid)
                    continue
                w.add_video(key_prefix + vid, blobs)
                ok_ids.append(vid)
    return ok_ids, failed


def lmdb_to_framepack(lmdb_path: str, out_path: str,
                      frames_per_video: int = 30) -> int:
    """Convert a reference LMDB ("{vid}_{i}" keys) into FramePack. Requires
    the optional lmdb binding. Returns number of videos converted."""
    import lmdb

    env = lmdb.open(lmdb_path, readonly=True, lock=False,
                    subdir=os.path.isdir(lmdb_path))
    by_video = {}
    with env.begin(write=False) as txn:
        for key, value in txn.cursor():
            name = key.decode()
            vid, _, idx = name.rpartition("_")
            if not vid:
                continue
            by_video.setdefault(vid, {})[int(idx)] = bytes(value)
    with FramePackWriter(out_path) as w:
        w.set_metadata(frames_per_video=frames_per_video,
                       converted_from="lmdb")
        for vid, frames in by_video.items():
            blobs = [frames[i] for i in sorted(frames)]
            w.add_video(vid, blobs)
    env.close()
    return len(by_video)
