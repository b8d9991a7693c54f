"""A/B `--fused_ema` on the pretrain MoCo step (real chip).

The r3 xplane profile puts the momentum EMA at 3.8% of the pretrain
step (a ~1.8 GB fp32 HBM pass) and BertAdam at 13.6%; both read the
parameter tree. ``fused_ema`` moves each step's last EMA next to
BertAdam's parameter write (algebraically identical trajectory —
tests/test_trainer.py), letting XLA fuse the two per-leaf passes and
drop one full fp32 read of the params.

Interleaved windows over a SHARED device state (the state layout is
identical under both step programs). Prints one JSON line per mode.

  python tools/bench_fused_ema.py [--batch 16]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    from hmmc_tpu.train.trainer import make_pretrain_step

    step_a, state, batch = bench.build_pretrain(args.batch)
    # rebuild only the step with the flag; model/tx/task mirror
    # build_pretrain exactly (state layout is flag-independent)
    import jax.numpy as jnp

    from hmmc_tpu.config import ClipArch, CrossConfig, TaskConfig
    from hmmc_tpu.models.pretrain import BirdPretrainModel
    from hmmc_tpu.train.optimization import build_optimizer

    arch = ClipArch.by_name("ViT-B/32")
    cross = CrossConfig()
    task = TaskConfig(do_pretrain=True, dataset="bird", language="english",
                      use_temp=True, use_frame_fea=True, max_frames=12,
                      contrast_num_negative=1024)
    model = BirdPretrainModel(vocab_size=49408, arch=arch,
                              cross_config=cross, dtype=jnp.bfloat16)
    p_shapes = jax.eval_shape(lambda: state.params)
    tx = build_optimizer(p_shapes, lr=1e-4, text_lr=1e-5, coef_lr=1e-3,
                         weight_decay=0.2, warmup_proportion=0.1,
                         t_total=3600)
    step_b = make_pretrain_step(model, tx, cross, task,
                                mask_token_id=49394, pad_token_id=49407,
                                cls_token_id=49406, fused_ema=True)
    rngs = [jax.random.PRNGKey(100 + i) for i in range(64)]

    def window(step, warmup):
        st = jax.tree_util.tree_map(lambda x: x.copy(), state)
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

    samples = {"unfused": [], "fused_ema": []}
    for r in range(args.rounds):
        warm = 2 if r == 0 else 1
        samples["unfused"].append(window(step_a, warm))
        samples["fused_ema"].append(window(step_b, warm))
    for name, vals in samples.items():
        print(json.dumps({
            "mode": f"pretrain_b{args.batch}", "variant": name,
            "clips_per_sec": round(float(np.median(vals)), 2),
            "spread": [round(min(vals), 2), round(max(vals), 2)],
        }), flush=True)


if __name__ == "__main__":
    main()
