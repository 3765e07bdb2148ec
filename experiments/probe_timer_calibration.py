"""Calibrate the bench timing methodology against a known-FLOP workload.

Motivation (2026-08-19): bench_train_iou.py reruns with the batch
device_put ONCE reported MFU 3.11 — above 1.0, physically impossible —
so either (a) the async-dispatch/block-at-end timing under-measures
through the axon tunnel, or (b) the XLA cost-analysis FLOP count is
inflated.  This probe separates the two: it times a chain of bf16
matmuls whose FLOPs are known analytically (2*N^3 per matmul), using
the EXACT methodology of bench_train_iou.py (Python loop of dependent
jitted steps, jax.block_until_ready on the final output).  If the
apparent throughput exceeds the chip's peak (197 TFLOP/s on v5e), the
timer is broken; if it is sane (0.5-0.95x peak for large matmuls), the
timer is fine and the train-step cost_analysis FLOPs are the suspect.

    python experiments/probe_timer_calibration.py [--n 4096] [--iters 50]
"""
from __future__ import annotations

import argparse
import json
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--chain", type=int, default=8,
                   help="matmuls per jitted step")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    n, chain = args.n, args.chain

    @jax.jit
    def step(y, w):
        for _ in range(chain):
            y = y @ w
        # renormalize so the values stay finite across iterations
        return y / jnp.float32(n).astype(y.dtype)

    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (n, n), jnp.bfloat16) / n ** 0.5
    y = jax.random.normal(key, (n, n), jnp.bfloat16)

    y = step(y, w)  # compile
    jax.block_until_ready(y)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        y = step(y, w)
    jax.block_until_ready(y)
    dt = time.perf_counter() - t0

    flops_per_step = 2.0 * n * n * n * chain
    tflops = flops_per_step * args.iters / dt / 1e12
    per_step_ms = dt / args.iters * 1e3

    # cross-check: what does XLA cost_analysis think one step costs?
    ca_flops = None
    try:
        ca = step.lower(y, w).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        ca_flops = float(ca.get("flops", 0.0))
    except Exception:
        pass

    print(json.dumps({
        "n": n, "chain": chain, "iters": args.iters,
        "step_ms": round(per_step_ms, 3),
        "analytic_tflops_per_s": round(tflops, 1),
        "analytic_flops_per_step": flops_per_step,
        "cost_analysis_flops_per_step": ca_flops,
        "device_kind": jax.devices()[0].device_kind,
        "verdict": ("TIMER BROKEN (apparent > v5e peak 197)" if tflops > 210
                    else "timer sane"),
    }))


if __name__ == "__main__":
    main()
