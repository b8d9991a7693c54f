"""Validate a --data_dir layout before launching a run.

Checks the files each dataset/split needs (docs/data.md layout; the
registry's resolution rules), opens the frame store, and samples a few
video ids to confirm frames decode. Exits non-zero when a requested
dataset cannot run — a bad mount then fails in seconds, not after the
model build.

  python tools/validate_data.py --data_dir /data --dataset msrvtt
  python tools/validate_data.py --data_dir /data --all
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REQUIRED = {
    "msrvtt": ["msrvtt/MSRVTT_JSFUSION_test.1k.csv",
               "msrvtt/MSRVTT_train.9k.csv", "msrvtt/MSRVTT_data.json"],
    "vatex": ["vatex/vatex_data.json"],
    "bird": ["bird/pretrain.json", "bird/query.json"],
    "msvd": ["msvd/videos", "msvd/test_list.txt", "msvd/raw-captions.pkl"],
    "lsmdc": ["lsmdc/videos",
              "lsmdc/LSMDC16_challenge_1000_publictect.csv"],
}
OPTIONAL = {
    "vatex": ["vatex/train_list.txt", "vatex/val_list.txt",
              "vatex/test_list.txt"],   # bundled fallback exists
    "bird": ["bird/val.json"],
    "msvd": ["msvd/train_list.txt", "msvd/val_list.txt"],
    "lsmdc": ["lsmdc/LSMDC16_annos_training.csv",
              "lsmdc/LSMDC16_annos_val.csv"],
}
FRAME_STORE = {"msrvtt", "vatex", "bird"}  # raw-video sets need none


def check_dataset(base: str, name: str) -> bool:
    ok = True
    print(f"[{name}]")
    for rel in REQUIRED.get(name, []):
        p = os.path.join(base, rel)
        exists = os.path.exists(p)
        print(f"  {'ok  ' if exists else 'MISS'} {rel}")
        ok &= exists
    for rel in OPTIONAL.get(name, []):
        p = os.path.join(base, rel)
        note = "ok  " if os.path.exists(p) else "opt "
        extra = ""
        if not os.path.exists(p) and name == "vatex" and rel.endswith(
                "_list.txt"):
            extra = " (bundled tools/vatex_txt fallback will be used)"
        print(f"  {note} {rel}{extra}")

    if name in FRAME_STORE:
        store = None
        for cand in (os.path.join(base, name, "frames.fpk"),
                     os.path.join(base, "frames.fpk"),
                     os.path.join(base, name, "lmdb"),
                     os.path.join(base, "lmdb")):
            if os.path.exists(cand):
                store = cand
                break
        if store is None:
            print("  MISS frame store (frames.fpk / lmdb)")
            return False
        print(f"  ok   frame store: {os.path.relpath(store, base)}")
        try:
            from hmmc_tpu.data.datasets import FrameSource

            prefix = "Video" if name == "bird" else ""
            src = FrameSource(store, frames_per_video=30, mode="eval",
                              resolution=64, key_prefix=prefix)
            ids = list(getattr(src.store, "video_ids", lambda: [])())[:3]
            for vid in ids:
                n = src.store.num_frames(vid)
                frame = src.store.get_frames(vid, [0])[0]
                assert len(frame) > 0
                print(f"  ok   sample {vid!r}: {n} frames, "
                      f"first {len(frame)} bytes")
            if not ids:
                print("  WARN frame store is empty")
                ok = False
        except Exception as e:
            print(f"  FAIL frame store read: {type(e).__name__}: {e}")
            ok = False
    return ok


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True)
    p.add_argument("--dataset", choices=sorted(REQUIRED), default=None)
    p.add_argument("--all", action="store_true")
    args = p.parse_args()

    names = sorted(REQUIRED) if (args.all or not args.dataset) \
        else [args.dataset]
    ok = True
    for n in names:
        ok &= check_dataset(args.data_dir, n)
        print()
    if not ok:
        print("INVALID: required files are missing (see MISS/FAIL above)")
        sys.exit(1)
    print("OK")


if __name__ == "__main__":
    main()
