"""Interleaved A/B of `--optim_bf16_state` on the PRETRAIN MoCo step.

Round 4's rebuilt bench gate settled the finetune bf16-state question
(+2.9/3.3% across two gate runs, disjoint spreads); the pretrain claim
(+2.6%, docs/design.md) still rested on r3 manual run pairs. This tool
applies the same interleaved-window method to the pretrain step. The
two variants carry different optimizer-state dtypes, so each window
re-initializes its own state on device via a jitted init (only one
variant's state is ever resident).

  python tools/bench_pretrain_bf16.py [--batch 16]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402


def build_variant(batch_size: int, state_dtype):
    import jax
    import jax.numpy as jnp

    from hmmc_tpu.config import ClipArch, CrossConfig, TaskConfig
    from hmmc_tpu.models.pretrain import BirdPretrainModel, MoCoQueues
    from hmmc_tpu.train.optimization import build_optimizer
    from hmmc_tpu.train.trainer import PretrainState, make_pretrain_step

    bench._enable_cache()
    arch = ClipArch.by_name("ViT-B/32")
    cross = CrossConfig()
    task = TaskConfig(do_pretrain=True, dataset="bird", language="english",
                      use_temp=True, use_frame_fea=True, max_frames=12,
                      contrast_num_negative=1024)
    model = BirdPretrainModel(vocab_size=49408, arch=arch,
                              cross_config=cross, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    f, l = 12, 32
    init_args = (jnp.zeros((2, l), jnp.int32), jnp.ones((2, l), jnp.int32),
                 jnp.zeros((2, f, 224, 224, 3), jnp.float32))
    p_shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), *init_args))["params"]
    tx = build_optimizer(p_shapes, lr=1e-4, text_lr=1e-5, coef_lr=1e-3,
                         weight_decay=0.2, warmup_proportion=0.1,
                         t_total=3600, state_dtype=state_dtype)
    step = make_pretrain_step(model, tx, cross, task, mask_token_id=49394,
                              pad_token_id=49407, cls_token_id=49406)

    def _mk():
        variables = model.init(jax.random.PRNGKey(0), *init_args)
        queues = MoCoQueues.create(jax.random.PRNGKey(1),
                                   arch.embed_dim, 1024, f)
        return PretrainState.create(variables, tx, queues)

    make_state = jax.jit(_mk)
    b = batch_size
    batch = {
        "title_ids": jnp.asarray(rng.integers(1, 49000, size=(b, l)),
                                 jnp.int32),
        "title_mask": jnp.ones((b, l), jnp.int32),
        "tag_ids": jnp.asarray(rng.integers(1, 49000, size=(b, l)),
                               jnp.int32),
        "tag_mask": jnp.ones((b, l), jnp.int32),
        "video": jnp.asarray(
            rng.normal(size=(b, f, 224, 224, 3)).astype(np.float32)),
    }
    return step, make_state, batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    variants = {
        "fp32_state": build_variant(args.batch, None),
        "bf16_state": build_variant(args.batch, jnp.bfloat16),
    }
    rngs = [jax.random.PRNGKey(100 + i) for i in range(64)]

    def window(step, make_state, batch, warmup):
        st = make_state()
        for i in range(warmup):
            st, metrics = step(st, batch, rngs[i])
        float(metrics["loss"])
        t0 = time.perf_counter()
        for i in range(args.iters):
            st, metrics = step(st, batch, rngs[warmup + i])
        float(metrics["loss"])
        dt = time.perf_counter() - t0
        del st
        return args.batch * args.iters / dt

    samples = {k: [] for k in variants}
    for r in range(args.rounds):
        for name, (step, mk, batch) in variants.items():
            samples[name].append(window(step, mk, batch,
                                        2 if r == 0 else 1))
    meds = {}
    for name, vals in samples.items():
        meds[name] = float(np.median(vals))
        print(json.dumps({
            "mode": f"pretrain_b{args.batch}", "variant": name,
            "clips_per_sec": round(meds[name], 2),
            "spread": [round(min(vals), 2), round(max(vals), 2)],
        }), flush=True)
    if meds.get("fp32_state"):
        print(json.dumps({
            "bf16_state_delta_pct": round(
                100.0 * (meds["bf16_state"] - meds["fp32_state"])
                / meds["fp32_state"], 2)}))


if __name__ == "__main__":
    main()
