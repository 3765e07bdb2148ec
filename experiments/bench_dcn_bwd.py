"""Microbench: deform_conv2d forward vs backward cost per DLA-34 node shape.

Isolates which gradient (dx / doffsets / dmasks / dweights) dominates the
train-step cost of the 18 DCN nodes (the gather's transpose is a
scatter-add, historically slow on TPU).

    python experiments/bench_dcn_bwd.py [--dtype bfloat16]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args):
    # scan-differenced on-device time: a dispatch loop +
    # block_until_ready returned 0.03 ms for EVERY grad of an
    # 8x128x256x64 DCN on 2026-08-19 — block_until_ready acknowledges
    # dispatch, not execution, through the axon tunnel (see
    # utils/timing.py and probe_timer_calibration.py).
    from centerpoly_tpu.utils.timing import measure_device_time, scalarize
    return measure_device_time(scalarize(fn), list(args),
                               k_small=1, k_big=9, reps=3)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from centerpoly_tpu.models.deform_conv import deform_conv2d

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    b = args.batch
    # the IDAUp/DLAUp node shapes of DLA-34 at 512x1024 input
    shapes = [
        (b, 128, 256, 64, 64),
        (b, 64, 128, 128, 128),
        (b, 32, 64, 256, 256),
        (b, 128, 256, 128, 64),
        (b, 64, 128, 256, 128),
    ]
    rng = np.random.RandomState(0)
    rows = []
    for (bb, h, w, cin, cout) in shapes:
        x = jnp.asarray(rng.randn(bb, h, w, cin), dt)
        off = jnp.asarray(rng.randn(bb, h, w, 18) * 2, dt)
        mask = jnp.asarray(rng.rand(bb, h, w, 9), dt)
        wgt = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, dt)
        bias = jnp.zeros((cout,), dt)

        row = {"shape": f"{bb}x{h}x{w}x{cin}->{cout}"}
        # per-shape/per-grad failures (e.g. the 8x64x128x256->128 dx
        # gradient deterministically OOMs VMEM at compile, 2026-08-20)
        # must not abort the remaining shapes: record and continue
        try:
            fwd = jax.jit(deform_conv2d)
            row["fwd_ms"] = round(timeit(fwd, x, off, mask, wgt, bias)
                                  * 1e3, 2)

            def loss(x, off, mask, wgt, bias):
                return jnp.sum(deform_conv2d(x, off, mask, wgt, bias)
                               .astype(jnp.float32) ** 2)

            for name, argnum in [("dx", 0), ("doff", 1), ("dmask", 2),
                                 ("dw", 3)]:
                g = jax.jit(jax.grad(loss, argnums=argnum))
                try:
                    row[f"{name}_ms"] = round(
                        timeit(g, x, off, mask, wgt, bias) * 1e3, 2)
                except Exception as e:
                    row[f"{name}_error"] = str(e).splitlines()[0][:160]
            g_all = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
            try:
                row["dall_ms"] = round(
                    timeit(g_all, x, off, mask, wgt, bias) * 1e3, 2)
            except Exception as e:
                row["dall_error"] = str(e).splitlines()[0][:160]
        except Exception as e:
            row["error"] = str(e).splitlines()[0][:160]
        rows.append(row)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
