"""Stretch-config benchmark: ViT-B/16, max_frames=30 (BASELINE.json #5).

Patch-16 at 224px -> 197 tokens/frame, 30 frames/clip: per-clip compute is
~16x the headline B/32x12 point (4x tokens x 2.5x frames), and the
attention length is where the Pallas kernel decision could flip
(docs/design.md: crossover L>=512 measured at B/32 geometry).

Sweeps batch x {XLA attention, Pallas attention} for the fine-tune train
step and prints one JSON line per point plus a recommendation. Run on the
real chip:

  python tools/bench_stretch.py [--iters 6] [--batches 2,4,8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(batch_size: int, use_pallas: bool, frames: int = 30,
          state_dtype=None):
    import jax
    import jax.numpy as jnp

    from hmmc_tpu.config import ClipArch, CrossConfig
    from hmmc_tpu.models.retrieval import BirdModel
    from hmmc_tpu.train.optimization import build_optimizer
    from hmmc_tpu.train.trainer import FinetuneState, make_finetune_step

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/hmmc_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    arch = ClipArch.by_name("ViT-B/16")
    # 30 frames needs a position table >= 30 (reference ships 48,
    # cross_config.json max_position_embeddings)
    cross = CrossConfig(max_position_embeddings=48)
    model = BirdModel(arch, cross, dtype=jnp.bfloat16,
                      use_pallas=use_pallas)
    rng = np.random.default_rng(0)
    l = 32
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, l), jnp.int32), jnp.ones((1, l), jnp.int32),
        jnp.zeros((1, frames, 224, 224, 3), jnp.float32))["params"]
    b = batch_size
    batch = {
        "query_ids": jnp.asarray(rng.integers(1, 49000, size=(b, l)),
                                 jnp.int32),
        "query_mask": jnp.ones((b, l), jnp.int32),
        "video": jnp.asarray(
            rng.normal(size=(b, frames, 224, 224, 3)).astype(np.float32)),
    }
    tx = build_optimizer(params, lr=1e-4, text_lr=1e-5, coef_lr=1e-3,
                         weight_decay=0.2, warmup_proportion=0.1,
                         t_total=3600, state_dtype=state_dtype)
    state = FinetuneState.create(params, tx)
    step = make_finetune_step(model, tx, cross, use_frame_fea=True)
    return step, state, batch


def run_point(batch_size: int, use_pallas: bool, iters: int,
              frames: int = 30, state_dtype=None):
    step, state, batch = build(batch_size, use_pallas, frames,
                               state_dtype=state_dtype)
    for _ in range(2):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, batch)
        float(metrics["loss"])
        dt = time.perf_counter() - t0
        best = max(best, batch_size * iters / dt)
    flops = None
    try:
        cost = step.lower(state, batch).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost["flops"])
    except Exception:
        pass
    return best, flops


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--frames", type=int, default=30)
    p.add_argument("--batches", default="2,4,8")
    p.add_argument("--bf16_state", action="store_true",
                   help="bf16 BertAdam moments (--optim_bf16_state): part "
                        "of the measured b8 recipe — kernel + bf16 moments "
                        "together run 25.27 clips/s at b8 where neither "
                        "alone fits/wins (docs/design.md)")
    args = p.parse_args()

    from bench import _peak_flops  # reuse the per-gen peak table

    state_dtype = None
    if args.bf16_state:
        import jax.numpy as jnp

        state_dtype = jnp.bfloat16
    results = []
    for b in [int(x) for x in args.batches.split(",")]:
        for pallas in (False, True):
            tag = f"b{b}_{'pallas' if pallas else 'xla'}"
            if args.bf16_state:
                tag += "_bf16state"
            try:
                clips, flops = run_point(b, pallas, args.iters, args.frames,
                                         state_dtype=state_dtype)
                mfu = (flops * (clips / b) / _peak_flops()
                       if flops else None)
                rec = {"point": tag, "clips_per_sec_per_chip":
                       round(clips, 2),
                       "mfu": round(mfu, 4) if mfu else None}
                results.append((tag, clips))
            except Exception as e:
                rec = {"point": tag,
                       "error": f"{type(e).__name__}: {str(e)[:160]}"}
            print(json.dumps(rec), flush=True)
    if results:
        best = max(results, key=lambda r: r[1])
        print(json.dumps({
            "metric": "stretch_vitb16_f30_clips_per_sec_per_chip",
            "value": round(best[1], 2), "unit": "clips/s/chip",
            "best_point": best[0]}))


if __name__ == "__main__":
    main()
