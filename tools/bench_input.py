"""Input-pipeline throughput benchmark: FramePack read + JPEG decode +
batching, native C++ decoder vs PIL/cv2 paths.

Builds a synthetic FramePack (or uses --store), then measures clips/sec
through BatchLoader with each decode backend. This is the host-side half of
the training data path; the device-side half (normalize / SimCLR aug) runs
inside the jitted step.

  python tools/bench_input.py [--clips 256] [--frames 12] [--workers 4]
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hmmc_tpu.data.datasets import FrameSource  # noqa: E402
from hmmc_tpu.data.framepack import FramePackWriter  # noqa: E402
from hmmc_tpu.data.loader import BatchLoader  # noqa: E402


class _FrameOnlyDataset:
    def __init__(self, source, ids, frames):
        self.source = source
        self.ids = ids
        self.frames = frames

    def __len__(self):
        return len(self.ids)

    def __getitem__(self, i):
        idx = np.linspace(0, self.source.default_frames, self.frames,
                          endpoint=False, dtype=int)
        return {"video": self.source.load(self.ids[i], idx)}


def build_store(path, n_videos, stored_frames, size=340):
    from PIL import Image

    rng = np.random.default_rng(0)
    with FramePackWriter(path) as w:
        w.set_metadata(frames_per_video=stored_frames, store_size=size)
        base = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
        for i in range(n_videos):
            frames = []
            for f in range(stored_frames):
                img = np.roll(base, i * 7 + f, axis=1)
                buf = io.BytesIO()
                Image.fromarray(img).save(buf, format="JPEG", quality=90)
                frames.append(buf.getvalue())
            w.add_video(f"v{i}", frames)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--store", default=None)
    p.add_argument("--clips", type=int, default=128)
    p.add_argument("--frames", type=int, default=12)
    p.add_argument("--stored_frames", type=int, default=30)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--resolution", type=int, default=224)
    args = p.parse_args()

    if args.store:
        store = args.store
    else:
        tmp = tempfile.mkdtemp()
        store = os.path.join(tmp, "bench.fpk")
        print("building synthetic store...", file=sys.stderr)
        build_store(store, args.clips, args.stored_frames)

    ids = [f"v{i}" for i in range(args.clips)]
    # warm the page cache so the first backend measured isn't penalized
    warm = FrameSource(store, frames_per_video=args.stored_frames,
                       mode="eval", resolution=args.resolution,
                       use_native=False)
    for vid in ids:
        warm.store.get_frames(vid, list(range(args.stored_frames)))
    for name, use_native in (("native-c++", True), ("pil/cv2", False)):
        try:
            src = FrameSource(store, frames_per_video=args.stored_frames,
                              mode="eval", resolution=args.resolution,
                              use_native=use_native)
            ds = _FrameOnlyDataset(src, ids, args.frames)
            loader = BatchLoader(ds, batch_size=args.batch,
                                 num_workers=args.workers)
            n = 0
            t0 = time.perf_counter()
            for b in loader:
                n += b["video"].shape[0]
            dt = time.perf_counter() - t0
            print(f"{name}: {n / dt:.1f} clips/s "
                  f"({n * args.frames / dt:.0f} frames/s)")
        except Exception as e:
            print(f"{name}: unavailable ({type(e).__name__}: {e})")


if __name__ == "__main__":
    main()
