"""Row-band Pallas DCNv2 vs the XLA formulations, on the real chip.

Compile-probes kernels/dcn_rowband.py at production DLA-34 DCN node
shapes, checks bf16 numerics against the XLA path (same y-only clamp),
and scan-difference times it against the XLA tapwise/quad/fused
formulations (VERDICT round-2 item 6's measurement).

    python experiments/bench_dcn_rowband.py [--r 4] [--shapes all]

Prints one JSON line per shape.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

# DLA-34 DCN node shapes for a 1024x2048 frame (bench.py config)
SHAPES = {
    "small": [(128, 256, 64, 64)],
    "all": [(128, 256, 64, 64), (64, 128, 128, 128),
            (32, 64, 256, 256), (64, 128, 256, 256),
            (128, 256, 128, 128)],
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--r", type=int, default=4, help="max |y-offset|")
    p.add_argument("--shapes", default="all", choices=list(SHAPES))
    p.add_argument("--batch", type=int, default=1,
                   help="batch size (train benches run b=8; the rowband "
                        "grid scales as z=b*h, so per-band cost should "
                        "be batch-invariant — measure, don't assume)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental.compilation_cache import compilation_cache as cc

    cc.set_cache_dir(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))

    from centerpoly_tpu.kernels.dcn_rowband import (
        _clamp_y, deform_conv2d_rowband)
    from centerpoly_tpu.models.deform_conv import (
        deform_conv2d, deform_conv2d_quad, deform_conv2d_tapwise)
    from centerpoly_tpu.utils.timing import (
        measure_device_time, scalarize)

    rng = np.random.RandomState(0)
    r = float(args.r)
    b = args.batch
    any_compiled = False
    for (h, w, c, cout) in SHAPES[args.shapes]:
        x = jax.device_put(jnp.asarray(
            rng.randn(b, h, w, c), jnp.bfloat16))
        off = jax.device_put(jnp.asarray(
            rng.randn(b, h, w, 18) * 2, jnp.float32))
        mk = jax.device_put(jax.nn.sigmoid(jnp.asarray(
            rng.randn(b, h, w, 9), jnp.float32)))
        wt = jax.device_put(jnp.asarray(
            rng.randn(3, 3, c, cout) * 0.05, jnp.bfloat16))
        bs = jax.device_put(jnp.asarray(rng.randn(cout), jnp.bfloat16))

        row = {"shape": [b, h, w, c, cout], "R": args.r}

        # XLA paths on the SAME y-clamped offsets (apples to apples)
        def clamped(fn):
            return jax.jit(lambda x_, o_, m_, w_, b_: fn(
                x_, _clamp_y(o_, r), m_, w_, b_))

        t0 = time.perf_counter()
        try:
            rb_fn = jax.jit(
                lambda *a: deform_conv2d_rowband(*a, args.r))
            out_k = rb_fn(x, off, mk, wt, bs)
            jax.block_until_ready(out_k)
            row["rowband_compile_s"] = round(time.perf_counter() - t0, 1)
            any_compiled = True
        except Exception as e:
            row["rowband_compile_s"] = None
            row["rowband_error"] = str(e).splitlines()[0][:200]
            print(json.dumps(row), flush=True)
            continue

        xla_fns = {"tapwise": clamped(deform_conv2d_tapwise),
                   "quad": clamped(deform_conv2d_quad),
                   "fused": clamped(deform_conv2d)}
        out_x = xla_fns["fused"](x, off, mk, wt, bs)
        jax.block_until_ready(out_x)
        err = float(jnp.max(jnp.abs(out_k.astype(jnp.float32)
                                    - out_x.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(out_x.astype(jnp.float32)))) + 1e-8
        row["max_abs_err_bf16"] = err
        row["rel_err"] = err / scale

        def bench(fn):
            return measure_device_time(
                scalarize(fn), (x, off, mk, wt, bs), reps=3)

        row["rowband_s"] = round(bench(rb_fn), 6)
        for name, fn in xla_fns.items():
            row[f"{name}_s"] = round(bench(fn), 6)
        best_xla = min(row[f"{n}_s"] for n in xla_fns)
        row["rowband_vs_best_xla"] = round(best_xla / row["rowband_s"], 3)

        # backward: fused Pallas bwd kernel vs XLA autodiff (same clamp)
        def rb_loss(*a):
            return jnp.sum(deform_conv2d_rowband(*a, args.r).astype(
                jnp.float32) ** 2)

        def xla_loss(*a):
            from centerpoly_tpu.models.deform_conv import deform_conv2d_quad
            return jnp.sum(deform_conv2d_quad(
                a[0], _clamp_y(a[1], r), *a[2:]).astype(jnp.float32) ** 2)

        def bench_g(loss):
            def scalar(eps, *a):
                gr = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
                    a[0] + eps.astype(a[0].dtype), *a[1:])
                return sum(jnp.sum(t.astype(jnp.float32)) for t in gr)
            return measure_device_time(scalar, (x, off, mk, wt, bs),
                                       reps=3)

        t0 = time.perf_counter()
        try:
            gk = jax.jit(jax.grad(rb_loss, argnums=(0, 1, 2, 3, 4)))(
                x, off, mk, wt, bs)
            jax.block_until_ready(gk)
            row["rowband_bwd_compile_s"] = round(
                time.perf_counter() - t0, 1)
            row["rowband_bwd_s"] = round(bench_g(rb_loss), 6)
            row["xla_quad_bwd_s"] = round(bench_g(xla_loss), 6)
            row["rowband_bwd_vs_xla_quad"] = round(
                row["xla_quad_bwd_s"] / row["rowband_bwd_s"], 3)
        except Exception as e:
            row["rowband_bwd_error"] = str(e).splitlines()[0][:200]
        print(json.dumps(row), flush=True)
    if not any_compiled:
        # every shape failed to compile: exit nonzero so the resumable
        # queue does NOT mark this step done (it marked the 2026-08-19
        # float-iota failure as done and skipped the retry)
        sys.exit(1)


if __name__ == "__main__":
    main()
