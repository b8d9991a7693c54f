"""Per-architecture fine-tune train-step benchmark on the current chip.

Sweeps batch sizes for any named CLIP tower the framework supports —
including RN50/RN101 (ModifiedResNet + AttentionPool2d) and ViT-L/14,
which the reference cannot train at all: with the shipped cross-base
config its 512-wide frame position embeddings break on 1024/768-dim
towers (module_cross.py:198), and its pretrain MLP heads hard-code 512
(modeling.py:788-807). Here every feature-width consumer derives from
``arch.embed_dim``, and the RN towers' BatchNorm runs as real train-step
state on ``FinetuneState``.

Prints one JSON line per (arch, batch) point with clips/s/chip and MFU,
plus a best-point summary per arch. Run on the real chip:

  python tools/bench_arch.py --archs RN50,ViT-L/14 [--batches 2,4,8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(arch_name: str, batch_size: int, frames: int,
          use_pallas: bool = False, remat: bool = False,
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
    arch = ClipArch.by_name(arch_name)
    cross = CrossConfig()
    model = BirdModel(arch, cross, dtype=jnp.bfloat16,
                      use_pallas=use_pallas, remat=remat)
    rng = np.random.default_rng(0)
    l, res = 32, arch.image_resolution
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, l), jnp.int32), jnp.ones((1, l), jnp.int32),
        jnp.zeros((1, frames, res, res, 3), jnp.float32))
    params = variables["params"]
    b = batch_size
    batch = {
        "query_ids": jnp.asarray(rng.integers(1, 49000, size=(b, l)),
                                 jnp.int32),
        "query_mask": jnp.ones((b, l), jnp.int32),
        "video": jnp.asarray(
            rng.normal(size=(b, frames, res, res, 3)).astype(np.float32)),
    }
    tx = build_optimizer(params, lr=1e-4, text_lr=1e-5, coef_lr=1e-3,
                         weight_decay=0.2, warmup_proportion=0.1,
                         t_total=3600, state_dtype=state_dtype)
    state = FinetuneState.create(params, tx,
                                 batch_stats=variables.get("batch_stats"))
    step = make_finetune_step(model, tx, cross, use_frame_fea=True)
    return step, state, batch


def run_point(arch_name: str, batch_size: int, iters: int, frames: int,
              use_pallas: bool = False, remat: bool = False,
              state_dtype=None):
    step, state, batch = build(arch_name, batch_size, frames,
                               use_pallas=use_pallas, remat=remat,
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
    p.add_argument("--archs", default="RN50,RN101,ViT-L/14")
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--frames", type=int, default=12)
    p.add_argument("--batches", default="2,4,8")
    p.add_argument("--attention", choices=["xla", "pallas", "both", "auto"],
                   default="xla",
                   help="which attention path(s) to bench — 'both' settles "
                        "the Pallas on/off question per geometry (the "
                        "kernel wins at L>=257: ViT-L/14@224 +12.7%, "
                        "@336px +27-33%; loses at L<=197); 'auto' benches "
                        "what config.resolve_use_pallas picks for each "
                        "(arch, batch) point (the shipped default)")
    p.add_argument("--bf16_state", action="store_true",
                   help="bf16 BertAdam moments; with --attention pallas "
                        "this is the measured recipe that fits "
                        "ViT-L/14@336px at batch 2 on a 16 GB chip "
                        "(docs/design.md)")
    p.add_argument("--remat", action="store_true",
                   help="checkpoint the towers (extends the batch envelope "
                        "for L/14@336 on a 16 GB chip)")
    args = p.parse_args()

    from bench import _peak_flops

    state_dtype = None
    if args.bf16_state:
        import jax.numpy as jnp

        state_dtype = jnp.bfloat16
    for arch_name in args.archs.split(","):
        attn_variants = {"xla": (False,), "pallas": (True,),
                         "both": (False, True),
                         "auto": (None,)}[args.attention]
        results = []
        for b in [int(x) for x in args.batches.split(",")]:
            if args.attention == "auto":
                from hmmc_tpu.config import (ClipArch,
                                             approx_vit_param_count,
                                             resolve_use_pallas)

                a = ClipArch.by_name(arch_name)
                attn_variants = (resolve_use_pallas(
                    "auto", a, batch_per_chip=b, frames=args.frames,
                    param_count=0 if a.is_resnet
                    else approx_vit_param_count(a)),)
            for use_pallas in attn_variants:
                tag = f"{arch_name}_b{b}"
                if args.attention == "auto":
                    tag += "_auto-" + ("pallas" if use_pallas else "xla")
                elif len(attn_variants) > 1 or use_pallas:
                    tag += "_pallas" if use_pallas else "_xla"
                if args.remat:
                    tag += "_remat"
                if args.bf16_state:
                    tag += "_bf16state"
                try:
                    clips, flops = run_point(arch_name, b, args.iters,
                                             args.frames,
                                             use_pallas=use_pallas,
                                             remat=args.remat,
                                             state_dtype=state_dtype)
                    mfu = (flops * (clips / b) / _peak_flops()
                           if flops else None)
                    rec = {"point": tag,
                           "clips_per_sec_per_chip": round(clips, 2),
                           "mfu": round(mfu, 4) if mfu else None}
                    results.append((tag, clips))
                except Exception as e:
                    rec = {"point": tag,
                           "error": f"{type(e).__name__}: {str(e)[:160]}"}
                print(json.dumps(rec), flush=True)
        if results:
            best = max(results, key=lambda r: r[1])
            print(json.dumps({
                "metric": f"{arch_name}_f{args.frames}"
                          "_clips_per_sec_per_chip",
                "value": round(best[1], 2), "unit": "clips/s/chip",
                "best_point": best[0]}))


if __name__ == "__main__":
    main()
