"""Offline video -> FramePack ingest CLI (reference: tools/frame2lmdb.py).

Reads a json manifest (either the reference's msrvtt/vatex json shapes or a
simple {"videos": [{"video_id", "path"}]} list), extracts N uniform frames
per video, short-side-resizes to --store_size, JPEG-encodes, and writes one
FramePack. Failed videos are reported and pruned from a rewritten manifest
(same contract as frame2lmdb.py:186-195).

  python tools/video2framepack.py --manifest vids.json \
      --video_root /data/videos --out /data/msrvtt/frames.fpk \
      --num_frames 30 --workers 16
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hmmc_tpu.data.ingest import videos_to_framepack  # noqa: E402


def load_manifest(path: str, video_root: str):
    with open(path, "r", encoding="utf-8") as f:
        data = json.load(f)
    def resolve(p: str) -> str:
        # relative manifest paths resolve against --video_root
        if p and not os.path.isabs(p) and video_root:
            return os.path.join(video_root, p)
        return p

    items = []
    if isinstance(data, dict) and "videos" in data:
        for itm in data["videos"]:
            vid = itm["video_id"]
            p = resolve(itm.get("path")) or os.path.join(
                video_root, vid + ".mp4")
            items.append((vid, p))
    elif isinstance(data, list):
        for itm in data:
            if isinstance(itm, str):
                items.append((os.path.splitext(os.path.basename(itm))[0],
                              resolve(itm)))
            else:
                items.append((itm["video_id"],
                              resolve(itm.get("path")) or os.path.join(
                                  video_root, itm["video_id"] + ".mp4")))
    else:
        raise ValueError(f"unrecognized manifest shape in {path}")
    return data, items


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--manifest", required=True)
    p.add_argument("--video_root", default="")
    p.add_argument("--out", required=True)
    p.add_argument("--num_frames", type=int, default=30)
    p.add_argument("--store_size", type=int, default=256)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--key_prefix", default="",
                   help='e.g. "Video" for the bird/CHVTT key scheme')
    args = p.parse_args()

    data, items = load_manifest(args.manifest, args.video_root)
    ok, failed = videos_to_framepack(
        items, args.out, num_frames=args.num_frames,
        store_size=args.store_size, num_workers=args.workers,
        key_prefix=args.key_prefix)
    print(f"packed {len(ok)} videos, {len(failed)} failed")
    if failed:
        pruned = args.manifest + ".pruned.json"
        keep = set(ok)
        if isinstance(data, dict) and "videos" in data:
            data["videos"] = [v for v in data["videos"]
                              if v["video_id"] in keep]
        with open(pruned, "w", encoding="utf-8") as f:
            json.dump(data, f)
        print(f"pruned manifest -> {pruned}")
        print("failed:", ",".join(failed[:20]),
              "..." if len(failed) > 20 else "")


if __name__ == "__main__":
    main()
