"""Throughput of attention-aware token filtering on the eval video path.

Measures the jitted eval ``encode_video`` block (the dominant cost of
retrieval evaluation and of serving-bank extraction — eval phase 1 runs
the ViT over every video) with the full tower vs `ops/token_filter`
pruned variants at several (filter_layer, keep) points.

Timing through a remote-attached chip: forward-only calls return at
enqueue, so each timed window chains ``iters`` calls by mixing the
previous pooled output back into the next input (zero-valued mix keeps
the numerics identical) and ends with one scalar fetch.

Usage: python tools/bench_tokenfilter.py [--arch ViT-B/32] [--block 64]
           [--frames 12] [--points 4:26,4:13,8:26]
Prints one JSON line per variant.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="ViT-B/32")
    p.add_argument("--block", type=int, default=64)
    p.add_argument("--frames", type=int, default=12)
    p.add_argument("--points", default="4:26,4:13,8:26",
                   help="comma list of filter_layer:keep")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--windows", type=int, default=2)
    p.add_argument("--attention", choices=["xla", "pallas"], default="xla",
                   help="tower attention path for the FULL variant (the "
                        "shipped default resolves per geometry — "
                        "config.resolve_use_pallas; measure both here)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from hmmc_tpu.config import ClipArch, CrossConfig
    from hmmc_tpu.models.retrieval import BirdModel
    from hmmc_tpu.ops import token_filter

    bench._enable_cache()
    arch = ClipArch.by_name(args.arch)
    cross = CrossConfig()
    model = BirdModel(arch, cross, dtype=jnp.bfloat16,
                      use_pallas=args.attention == "pallas")
    res = arch.image_resolution

    rng = np.random.default_rng(0)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32),
        jnp.zeros((1, args.frames, res, res, 3)))["params"]
    params = jax.device_put(params)
    video = jnp.asarray(
        rng.normal(size=(args.block, args.frames, res, res, 3))
        .astype(np.float32))

    def timed(fn):
        # params go in as an ARGUMENT — a closure would bake the ~600 MB
        # of weights into the HLO as literals and blow the remote-compile
        # upload limit (HTTP 413)
        def chained(v):
            out = v
            for _ in range(args.iters):
                pooled, _f = fn(params, out)
                # zero-valued dependency: chains the calls without
                # changing the input
                out = video + 0.0 * pooled.mean()
            return pooled

        pooled = chained(video)
        float(pooled.sum())  # warm + force
        best = None
        for _ in range(args.windows):
            t0 = time.perf_counter()
            pooled = chained(video)
            float(pooled.sum())
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return args.block * args.iters / best

    full = jax.jit(lambda p, v: model.apply(
        {"params": p}, v, method="encode_video"))
    base_cps = timed(full)
    n_tokens = arch.grid_size ** 2 + 1
    print(json.dumps({
        "arch": args.arch, "variant": f"full_{args.attention}",
        "block": args.block, "frames": args.frames, "tokens": n_tokens,
        "clips_per_sec": round(base_cps, 1)}), flush=True)

    for point in args.points.split(","):
        layer, keep = (int(t) for t in point.split(":"))
        fn = jax.jit(lambda p, v, la=layer, ke=keep: (
            token_filter.encode_video_filtered(
                {"params": p}, v, arch, cross, True, la, ke,
                dtype=jnp.bfloat16,
                use_pallas=args.attention == "pallas")))
        cps = timed(fn)
        print(json.dumps({
            "arch": args.arch, "variant": f"filter@{layer}/keep{keep}",
            "block": args.block, "frames": args.frames, "tokens": n_tokens,
            "clips_per_sec": round(cps, 1),
            "speedup": round(cps / base_cps, 3)}), flush=True)


if __name__ == "__main__":
    main()
