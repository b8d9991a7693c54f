"""Composite end-to-end training-throughput benchmark.

Measures the FULL data path the reference times as "1 h / 5 epochs /
batch 256" (README.md:54): FramePack store -> (native C++) JPEG decode in
loader threads -> host batching -> device transfer via device_prefetch ->
the real jitted ViT-B/32 fine-tune step. Reports three rates:

  input-only   clips/s the host pipeline sustains with no device work
  device-only  clips/s of the jitted step on device-resident data
               (what bench.py measures)
  end-to-end   clips/s with the loader feeding the step through
               device_prefetch (the real training rate)

and the utilization ratio end_to_end/device_only. On a 1-core host the
input pipeline is CPU-bound and the ratio is a lower bound; real TPU VM
hosts have >100 cores.

  python tools/bench_e2e.py [--clips 192] [--batch 16] [--workers 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_input import _FrameOnlyDataset, build_store  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--store", default=None)
    p.add_argument("--clips", type=int, default=192)
    p.add_argument("--frames", type=int, default=12)
    p.add_argument("--stored_frames", type=int, default=30)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--iters", type=int, default=24)
    args = p.parse_args()

    from hmmc_tpu.data.datasets import FrameSource
    from hmmc_tpu.data.loader import BatchLoader, device_prefetch

    if args.store:
        store = args.store
    else:
        tmp = tempfile.mkdtemp()
        store = os.path.join(tmp, "bench.fpk")
        print("building synthetic store...", file=sys.stderr)
        build_store(store, args.clips, args.stored_frames)

    ids = [f"v{i}" for i in range(args.clips)]
    src = FrameSource(store, frames_per_video=args.stored_frames,
                      mode="eval", resolution=224)
    ds = _FrameOnlyDataset(src, ids, args.frames)

    def make_loader():
        return BatchLoader(ds, batch_size=args.batch, drop_last=True,
                           num_workers=args.workers, prefetch=4)

    # ---- input-only (one warm pass first for the page cache)
    for b in make_loader():
        pass
    n = 0
    t0 = time.perf_counter()
    for b in make_loader():
        n += b["video"].shape[0]
    input_cps = n / (time.perf_counter() - t0)

    # ---- device-only (bench.py's measurement, same batch size)
    import bench

    device_cps = bench.run(args.batch, warmup=2, iters=args.iters)

    # ---- end-to-end: loader -> device_prefetch -> real step
    import jax.numpy as jnp

    from hmmc_tpu.ops import image_ops

    step, state, _ = bench.build(args.batch)
    rng = np.random.default_rng(0)
    qids = jnp.asarray(rng.integers(1, 49000, size=(args.batch, 32)),
                       jnp.int32)
    qmask = jnp.ones((args.batch, 32), jnp.int32)

    def place(b):
        video = image_ops.normalize(image_ops.to_float(
            jnp.asarray(b["video"])))
        return {"query_ids": qids, "query_mask": qmask, "video": video}

    def epoch():
        nonlocal state
        n = 0
        for dev in device_prefetch(iter(make_loader()), place):
            state, metrics = step(state, dev)
            n += args.batch
        float(metrics["loss"])  # force the chain
        return n

    epoch()                    # warm: compiles with the real place() path
    t0 = time.perf_counter()
    n = epoch()
    e2e_cps = n / (time.perf_counter() - t0)

    print(json.dumps({
        "input_only_clips_per_sec": round(input_cps, 1),
        "device_only_clips_per_sec": round(device_cps, 1),
        "end_to_end_clips_per_sec": round(e2e_cps, 1),
        "utilization_vs_device": round(e2e_cps / device_cps, 3),
        "batch": args.batch, "workers": args.workers,
        "host_cpus": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()
