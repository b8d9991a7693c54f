"""Serving-scale ranking benchmark: fp32 vs bf16 vs int8 feature banks.

Measures the retrieval hot path at production index sizes — ranking a
block of text queries against a resident video-feature bank and taking
the top-k — for the three bank precisions the framework supports
(fp32 banks, bf16 on-device casts, and ``--quantize_bank int8`` banks
via ops/quant.int8_rank, which runs the MXU's s8 x s8 -> s32 mode).

At serving scale (>= 1e5 videos) the matmul is HBM-bandwidth-bound on
the bank, so bytes/row is the whole game: int8 is 4x fp32.

  python tools/bench_serving.py [--videos 1000000] [--dim 512]
      [--queries 128] [--topk 10] [--iters 20]

Prints one JSON line per precision with queries/sec and bank bytes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _topk(sim, topk: int, exact: bool):
    """TPU-native top-k: jax.lax.approx_max_k is the MIPS-retrieval
    primitive (recall_target 0.95 default) and is several times faster
    than exact lax.top_k at index scale; --exact_topk switches back."""
    import jax

    if exact:
        return jax.lax.top_k(sim, topk)
    return jax.lax.approx_max_k(sim, topk, recall_target=0.95)


def _rank_fn(topk: int, dtype, exact: bool):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def rank(q, bank):
        sim = q.astype(dtype) @ bank.T
        return _topk(sim.astype(jnp.float32), topk, exact)

    return rank


def _rank_fn_int8(topk: int, exact: bool):
    import jax

    from hmmc_tpu.ops.quant import int8_rank

    @jax.jit
    def rank(q, bank_q, bank_scale):
        sim = int8_rank(q, bank_q, bank_scale)
        return _topk(sim, topk, exact)

    return rank


def _time(fn, args, iters: int, warmup: int = 3) -> float:
    """Seconds per call: chained dependent calls + one scalar fetch (the
    remote-tunnel-safe timing recipe — see bench.py)."""
    for _ in range(warmup):
        scores, idx = fn(*args)
    float(scores[0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        scores, idx = fn(*args)
    float(scores[0, 0])
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--videos", type=int, default=1_000_000)
    p.add_argument("--dim", type=int, default=512)
    p.add_argument("--queries", type=int, default=128)
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--exact_topk", action="store_true",
                   help="exact lax.top_k instead of lax.approx_max_k")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from hmmc_tpu.ops.quant import quantize_rows

    # generate the bank ON DEVICE: a videos x dim fp32 bank is GBs, and
    # host->device transfer through a remote tunnel would dominate setup
    from functools import partial

    @partial(jax.jit, static_argnums=(1, 2))
    def _make(key, n, d):
        x = jax.random.normal(key, (n, d), jnp.float32)
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    bank = _make(jax.random.PRNGKey(0), args.videos, args.dim)
    q_dev = _make(jax.random.PRNGKey(1), args.queries, args.dim)

    dev = jax.devices()[0].device_kind
    results = {}

    for name, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        bank_dev = bank.astype(dtype)
        sec = _time(_rank_fn(args.topk, dtype, args.exact_topk),
                    (q_dev, bank_dev), args.iters)
        results[name] = {
            "queries_per_sec": round(args.queries / sec, 1),
            "bank_bytes": int(bank_dev.nbytes),
        }
        del bank_dev

    bq_dev, bs_dev = jax.jit(quantize_rows)(bank)
    sec = _time(_rank_fn_int8(args.topk, args.exact_topk),
                (q_dev, bq_dev, bs_dev), args.iters)
    results["int8"] = {
        "queries_per_sec": round(args.queries / sec, 1),
        "bank_bytes": int(bq_dev.nbytes + bs_dev.nbytes),
    }

    for name, r in results.items():
        print(json.dumps({
            "metric": f"serving_rank_{name}",
            "videos": args.videos, "dim": args.dim,
            "queries_per_block": args.queries, "topk": args.topk,
            "device": dev, **r,
            "speedup_vs_fp32": round(
                r["queries_per_sec"]
                / results["fp32"]["queries_per_sec"], 2),
        }))


if __name__ == "__main__":
    main()
