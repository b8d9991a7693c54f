"""A/B the attention projection layout on the full train step.

The op profile attributes ~6% of the ViT-B/32 fine-tune step to
"data formatting" copies around the attention einsums
(docs/design.md). Round 3 tried re-laying out the einsums over the
packed projection's OUTPUT (XLA just moved the copies). This round's
candidate folds the head split into the projection GEMM itself
(`ops/attention._mha_batched_head`): a batched-over-heads einsum emits
q/k/v already head-major, so there is no head-split reshape for layout
assignment to materialize.

Interleaved rounds (inplace vs batched_head alternating) in ONE
process; each sample is a fresh-state window of chained steps ended by
a scalar fetch (only one configuration's state is resident at a time).
Prints one JSON line per mode with median + spread.

  python tools/bench_attn_layout.py [--batch 16] [--pretrain]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402
import hmmc_tpu.ops.attention as attention  # noqa: E402


def finetune_modes(batch: int):
    """{layout: bench._FinetuneCfg} — each cfg's jitted step is TRACED
    (first concrete call) while its layout is active; cfg.window()
    re-inits state per window so modes never co-reside.

    The trace must run HERE: make_finetune_step returns a lazily-jitted
    function whose Python body (and hence the _ATTN_LAYOUT read) only
    executes at the first concrete call — building the cfg alone would
    let both modes trace later, after the global is reset, and compare
    inplace against itself (advisor r4 finding)."""
    modes = {}
    for layout in ("inplace", "batched_head"):
        attention._ATTN_LAYOUT = layout
        cfg = bench._FinetuneCfg(batch)
        cfg._build()
        # one throwaway step forces jit tracing under the active layout
        # (jit populates its dispatch cache on CALL, not on build/lower)
        st = cfg._make_state()
        st, m = cfg._step(st, cfg._batch)
        float(m["loss"])
        del st
        modes[layout] = cfg
    attention._ATTN_LAYOUT = "inplace"
    return modes


def run_finetune(batch: int, rounds: int, iters: int):
    modes = finetune_modes(batch)
    samples = {k: [] for k in modes}
    for _ in range(rounds):
        for name, cfg in modes.items():
            samples[name].append(cfg.window(iters))
    return samples


def run_pretrain(batch: int, rounds: int, iters: int):
    """The pretrain state is layout-independent, so ONE device state is
    shared: each window threads a fresh on-device copy through the
    mode's step (the step donates its input)."""
    import jax

    rngs = [jax.random.PRNGKey(100 + i) for i in range(64)]

    def traced(step, state, batch_arrs):
        # force jit tracing while the layout global is active (see
        # finetune_modes) — the step donates its input, so trace on a copy
        st = jax.tree_util.tree_map(lambda x: x.copy(), state)
        st, m = step(st, batch_arrs, rngs[0])
        float(m["loss"])
        del st
        return step

    attention._ATTN_LAYOUT = "inplace"
    step_a, state, batch_arrs = bench.build_pretrain(batch)
    traced(step_a, state, batch_arrs)
    attention._ATTN_LAYOUT = "batched_head"
    step_b, state_b, batch_b = bench.build_pretrain(batch)
    traced(step_b, state_b, batch_b)
    del state_b, batch_b
    attention._ATTN_LAYOUT = "inplace"

    def window(step, warmup):
        st = jax.tree_util.tree_map(lambda x: x.copy(), state)
        for i in range(warmup):
            st, metrics = step(st, batch_arrs, rngs[i])
        float(metrics["loss"])
        t0 = time.perf_counter()
        for i in range(iters):
            st, metrics = step(st, batch_arrs, rngs[warmup + i])
        float(metrics["loss"])
        dt = time.perf_counter() - t0
        del st
        return batch * iters / dt

    samples = {"inplace": [], "batched_head": []}
    for r in range(rounds):
        warm = 2 if r == 0 else 1
        samples["inplace"].append(window(step_a, warm))
        samples["batched_head"].append(window(step_b, warm))
    return samples


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--pretrain", action="store_true")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    if args.pretrain:
        samples = run_pretrain(args.batch, args.rounds, args.iters)
    else:
        samples = run_finetune(args.batch, args.rounds, args.iters)
    for name, vals in samples.items():
        print(json.dumps({
            "mode": ("pretrain" if args.pretrain else "finetune")
                    + f"_b{args.batch}",
            "layout": name,
            "clips_per_sec": round(float(np.median(vals)), 2),
            "spread": [round(min(vals), 2), round(max(vals), 2)],
        }), flush=True)


if __name__ == "__main__":
    main()
