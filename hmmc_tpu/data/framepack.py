"""FramePack: a memory-mapped frame-blob container.

The reference stores per-frame JPEGs in LMDB keyed ``"{video_id}_{i}"``
(tools/frame2lmdb.py:160-166, dataloader_bird.py:139). This rebuild replaces
the LMDB C dependency with a purpose-built container optimized for the read
pattern the training pipeline actually has — random video, all/strided
frames of that video:

- one mmap'ed blob file; per-video frames stored CONTIGUOUSLY (an LMDB with
  per-frame keys scatters a video's frames across pages; here one video is
  one sequential read),
- a JSON index {video_id: [offset, [sizes...]]} loaded once (no per-read
  key lookups or page-cache churn through a B-tree),
- zero-copy reads: ``get_frame`` returns a memoryview into the mmap.

A gated LMDB reader (:class:`LmdbFrameReader`) keeps compatibility with
databases produced by the reference's ``tools/frame2lmdb.py`` when the
``lmdb`` binding is installed.

File layout:
    [8b magic 'FPACK\\x00\\x01\\x00'][8b index_offset little-endian]
    [frame blobs ...][JSON index][index ends at EOF]
"""

from __future__ import annotations

import json
import mmap
import os
import struct
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

MAGIC = b"FPACK\x00\x01\x00"


class FramePackWriter:
    """Append-only writer. Frames of one video must be added in one
    ``add_video`` call (contiguity guarantee)."""

    def __init__(self, path: str):
        self.path = path
        parent = os.path.dirname(os.path.abspath(path))
        os.makedirs(parent, exist_ok=True)
        self._f = open(path, "wb")
        self._f.write(MAGIC)
        self._f.write(struct.pack("<Q", 0))  # index offset patched on close
        self._index: Dict[str, Tuple[int, List[int]]] = {}
        self._meta: Dict[str, object] = {}

    def add_video(self, video_id: str, frames: Sequence[bytes]) -> None:
        if video_id in self._index:
            raise ValueError(f"duplicate video id {video_id!r}")
        offset = self._f.tell()
        sizes = []
        for blob in frames:
            self._f.write(blob)
            sizes.append(len(blob))
        self._index[video_id] = (offset, sizes)

    def set_metadata(self, **kv) -> None:
        self._meta.update(kv)

    def close(self) -> None:
        index_offset = self._f.tell()
        payload = json.dumps(
            {"index": self._index, "meta": self._meta}).encode("utf-8")
        self._f.write(payload)
        self._f.seek(len(MAGIC))
        self._f.write(struct.pack("<Q", index_offset))
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class FramePackReader:
    """mmap-backed random access. Fork-safe: the mmap is created lazily per
    process (like the reference's delayed lmdb env init,
    dataloader_bird.py:137-141)."""

    def __init__(self, path: str):
        self.path = path
        self._mm: Optional[mmap.mmap] = None
        self._file = None
        # read the index eagerly (small) without keeping an fd
        with open(path, "rb") as f:
            magic = f.read(len(MAGIC))
            if magic != MAGIC:
                raise ValueError(f"{path}: not a FramePack file")
            (index_offset,) = struct.unpack("<Q", f.read(8))
            f.seek(index_offset)
            payload = json.loads(f.read().decode("utf-8"))
        self._index: Dict[str, Tuple[int, List[int]]] = {
            k: (v[0], v[1]) for k, v in payload["index"].items()}
        self.metadata: Dict[str, object] = payload.get("meta", {})

    def _ensure_mmap(self):
        if self._mm is None:
            self._file = open(self.path, "rb")
            self._mm = mmap.mmap(self._file.fileno(), 0,
                                 access=mmap.ACCESS_READ)

    # -- reads ---------------------------------------------------------------

    def video_ids(self) -> Iterable[str]:
        return self._index.keys()

    def num_frames(self, video_id: str) -> int:
        return len(self._index[video_id][1])

    def get_frame(self, video_id: str, frame_idx: int) -> memoryview:
        """Zero-copy view of one frame blob."""
        self._ensure_mmap()
        offset, sizes = self._index[video_id]
        start = offset + sum(sizes[:frame_idx])
        return memoryview(self._mm)[start:start + sizes[frame_idx]]

    def get_frames(self, video_id: str,
                   indices: Sequence[int]) -> List[memoryview]:
        self._ensure_mmap()
        offset, sizes = self._index[video_id]
        starts = [offset] * len(sizes)
        acc = offset
        for i, s in enumerate(sizes):
            starts[i] = acc
            acc += s
        mv = memoryview(self._mm)
        return [mv[starts[i]:starts[i] + sizes[i]] for i in indices]

    def __contains__(self, video_id: str) -> bool:
        return video_id in self._index

    def __len__(self) -> int:
        return len(self._index)

    def close(self):
        if self._mm is not None:
            self._mm.close()
            self._file.close()
            self._mm = None


class LmdbFrameReader:
    """Reads reference-produced LMDBs (keys ``"{video_id}_{i}"``,
    tools/frame2lmdb.py:160). Requires the optional ``lmdb`` binding."""

    def __init__(self, path: str, frames_per_video: int = 30):
        try:
            import lmdb
        except ImportError as e:  # pragma: no cover - env dependent
            raise ImportError(
                "LmdbFrameReader needs the 'lmdb' package; convert the "
                "database with hmmc_tpu.data.ingest.lmdb_to_framepack "
                "instead") from e
        self._env = lmdb.open(
            path, readonly=True, readahead=False, meminit=False, lock=False,
            subdir=os.path.isdir(path))
        self._txn = self._env.begin(write=False, buffers=True)
        self.frames_per_video = frames_per_video

    def num_frames(self, video_id: str) -> int:
        return self.frames_per_video

    def get_frame(self, video_id: str, frame_idx: int) -> bytes:
        buf = self._txn.get(f"{video_id}_{frame_idx}".encode())
        if buf is None:
            raise KeyError(f"{video_id}_{frame_idx}")
        return bytes(buf)

    def get_frames(self, video_id: str, indices: Sequence[int]):
        return [self.get_frame(video_id, i) for i in indices]


def open_frame_store(path: str, frames_per_video: int = 30):
    """FramePack if the file has our magic; otherwise assume reference
    LMDB."""
    if os.path.isfile(path):
        with open(path, "rb") as f:
            if f.read(len(MAGIC)) == MAGIC:
                return FramePackReader(path)
    return LmdbFrameReader(path, frames_per_video)
