"""Measure XLA compiler-option variants of the jitted train steps.

The profiled pretrain step shows ~8% of time in un-overlapped VMEM
prefetch copies (docs/design.md "Pretrain MoCo step"); XLA's
latency-hiding scheduler and a larger scoped-VMEM budget are the two
single-chip knobs that can plausibly move that. Env XLA_FLAGS do NOT
reach the remote axon compiler, so variants are passed per-executable
via ``lowered.compile(compiler_options=...)`` (PJRT carries them).

Usage:  python tools/bench_compiler_options.py [--pretrain] [--iters N]
Prints one JSON line per variant: {"variant", "clips_per_sec", ...}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import bench  # noqa: E402  (repo-root bench.py)

VARIANTS = {
    "baseline": None,
    "lhs": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "lhs+vmem64m": {
        "xla_tpu_enable_latency_hiding_scheduler": "true",
        "xla_tpu_scoped_vmem_limit_kib": "65536",
    },
    # round-4 copy/fusion-targeted candidates (the r3 sweep tested the
    # two general knobs above; these aim at the ~8% un-overlapped
    # VMEM-prefetch copies and the attention data-formatting fusions
    # specifically). Unknown option names error per-variant and are
    # recorded — that is itself the answer for this toolchain.
    "vmem32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "no_dot_sr": {"xla_tpu_enable_dot_strength_reduction": "false"},
    "no_rwb_fusion": {"xla_tpu_rwb_fusion": "false"},
    "exhaustive_of": {
        "xla_tpu_enable_experimental_exhaustive_output_fusion": "true"},
    "bundle_cost": {"xla_tpu_use_bundle_aware_cost_model": "true"},
    "licm2x": {"xla_tpu_licm_size_inflation_ratio": "2.0"},
}


def time_compiled(compiled, state, batch, rngs, warmup, iters, windows):
    """Times ``iters`` chained steps; returns (best_dt, final_state).

    The step donates its input state, so the freshest output state is
    threaded through every call and returned for the next variant."""
    def call(st, i):
        return (compiled(st, batch) if rngs is None
                else compiled(st, batch, rngs[i]))

    for i in range(warmup):
        state, metrics = call(state, i)
    float(metrics["loss"])
    best = None
    for _ in range(windows):
        t0 = time.perf_counter()
        for i in range(iters):
            state, metrics = call(state, warmup + i)
        float(metrics["loss"])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrain", action="store_true")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--windows", type=int, default=2)
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()

    import jax

    if args.pretrain:
        step, state, batch = bench.build_pretrain(args.batch)
        rngs = [jax.random.PRNGKey(100 + i)
                for i in range(args.iters + 4)]
        lowered = step.lower(state, batch, rngs[0])
    else:
        step, state, batch = bench.build(args.batch)
        rngs = None
        lowered = step.lower(state, batch)

    for name in args.variants.split(","):
        opts = VARIANTS[name]
        try:
            compiled = (lowered.compile() if opts is None
                        else lowered.compile(compiler_options=opts))
            dt, state = time_compiled(compiled, state, batch, rngs,
                                      2, args.iters, args.windows)
            cps = args.batch * args.iters / dt
            print(json.dumps({"variant": name, "mode":
                              "pretrain" if args.pretrain else "finetune",
                              "batch": args.batch,
                              "clips_per_sec": round(cps, 1)}), flush=True)
        except Exception as e:  # an unknown option => report, keep going
            print(json.dumps({"variant": name,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
