"""DCNv2 kernel-vs-XLA microbenchmark on the real chip.

Probes the bounded-offset halo Pallas kernel (kernels/dcn_halo.py) at
production IDAUp shapes, checks it against the XLA formulation (same
clamp) in bf16, and times both.  VERDICT round-2 item 2's measurement.

    python experiments/bench_dcn_kernel.py [--r 4] [--shapes small|all]

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

# DLA-34 IDAUp DCN node shapes for a 1024x2048 input (bench.py config):
# strides 4/8/16 -> (H, W, C) with Cout == C after projection
SHAPES = {
    "small": [(64, 128, 256, 256)],
    "all": [(64, 128, 256, 256), (128, 256, 128, 128),
            (256, 512, 64, 64)],
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--r", type=int, default=4, help="max |offset| (halo)")
    p.add_argument("--shapes", default="all", choices=list(SHAPES))
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental.compilation_cache import compilation_cache as cc

    cc.set_cache_dir(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))

    from centerpoly_tpu.kernels.dcn_halo import deform_conv2d_halo
    from centerpoly_tpu.models.deform_conv import deform_conv2d

    rng = np.random.RandomState(0)
    r = float(args.r)
    for (h, w, c, cout) in SHAPES[args.shapes]:
        x = jax.device_put(jnp.asarray(
            rng.randn(1, h, w, c), jnp.bfloat16))
        # strictly inside (-r, r): at exact saturation the halo clamp
        # rule zeroes d(offset) while XLA clip autodiff passes it
        # through, which would make the bwd comparison meaningless
        off = jax.device_put(jnp.asarray(
            np.clip(rng.randn(1, h, w, 18) * 2, -r + 1e-2, r - 1e-2),
            jnp.float32))
        mk = jax.device_put(jax.nn.sigmoid(jnp.asarray(
            rng.randn(1, h, w, 9), jnp.float32)))
        wt = jax.device_put(jnp.asarray(
            rng.randn(3, 3, c, cout) * 0.05, jnp.bfloat16))
        bs = jax.device_put(jnp.asarray(rng.randn(cout), jnp.bfloat16))

        xla_fn = jax.jit(lambda *a: deform_conv2d(*a))
        row = {"shape": [h, w, c, cout], "R": args.r}

        t0 = time.perf_counter()
        try:
            halo_fn = jax.jit(
                lambda *a: deform_conv2d_halo(*a, args.r))
            out_k = halo_fn(x, off, mk, wt, bs)
            jax.block_until_ready(out_k)
            row["halo_compile_s"] = round(time.perf_counter() - t0, 1)
        except Exception as e:
            row["halo_compile_s"] = None
            row["halo_error"] = str(e).splitlines()[0][:160]
            print(json.dumps(row))
            continue

        out_x = xla_fn(x, off, mk, wt, bs)
        jax.block_until_ready(out_x)
        err = float(jnp.max(jnp.abs(out_k.astype(jnp.float32)
                                    - out_x.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(out_x.astype(jnp.float32)))) + 1e-8

        def bench(fn):
            # honest on-device time (block_until_ready does not fence on
            # this harness — see utils/timing.py)
            from centerpoly_tpu.utils.timing import (
                measure_device_time, scalarize)
            return measure_device_time(
                scalarize(fn), (x, off, mk, wt, bs), reps=3)

        row.update({
            "max_abs_err_bf16": err, "rel_err": err / scale,
            "halo_s": round(bench(halo_fn), 6),
            "xla_s": round(bench(xla_fn), 6),
        })
        row["halo_vs_xla"] = round(row["xla_s"] / row["halo_s"], 3)

        # backward: Pallas bwd kernel vs XLA autodiff (same clamp)
        def halo_loss(*a):
            return jnp.sum(deform_conv2d_halo(*a, args.r).astype(
                jnp.float32) ** 2)

        def xla_loss(*a):
            return jnp.sum(deform_conv2d(
                a[0], jnp.clip(a[1], -r, r), *a[2:]).astype(
                    jnp.float32) ** 2)

        t0 = time.perf_counter()
        try:
            halo_g = jax.jit(jax.grad(halo_loss, argnums=(0, 1, 2, 3, 4)))
            gk = halo_g(x, off, mk, wt, bs)
            jax.block_until_ready(gk)
            row["halo_bwd_compile_s"] = round(time.perf_counter() - t0, 1)
        except Exception as e:
            row["halo_bwd_compile_s"] = None
            row["halo_bwd_error"] = str(e).splitlines()[0][:160]
            print(json.dumps(row))
            continue
        xla_g = jax.jit(jax.grad(xla_loss, argnums=(0, 1, 2, 3, 4)))
        gx = xla_g(x, off, mk, wt, bs)
        jax.block_until_ready(gx)
        # p99.9 rel err alongside max: the bilinear hat's derivative is
        # discontinuous at integer sample positions, so when a random
        # offset lands within ~1e-6 of a knot (expectation ~1 over 147k
        # elements) the two implementations legitimately pick different
        # subgradients and the MAX is O(1) there while every off-knot
        # element agrees (diagnosed by perturbation: nudging the single
        # offending offset by +-1e-3 restores 1.5e-3 max agreement)
        for name, a_, b_ in zip(("dx", "doff", "dmask", "dw", "db"),
                                gk, gx):
            d_ = np.abs(np.asarray(a_, np.float64)
                        - np.asarray(b_, np.float64))
            s_ = float(np.abs(np.asarray(b_, np.float64)).max()) + 1e-8
            row[f"bwd_rel_err_{name}"] = round(float(d_.max()) / s_, 5)
            row[f"bwd_rel_err_p999_{name}"] = round(
                float(np.percentile(d_, 99.9)) / s_, 6)

        def bench_g(loss):
            from centerpoly_tpu.utils.timing import measure_device_time

            def scalar(eps, *a):
                g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
                    a[0] + eps.astype(a[0].dtype), *a[1:])
                return sum(jnp.sum(t.astype(jnp.float32)) for t in g)

            return measure_device_time(
                scalar, (x, off, mk, wt, bs), reps=3)

        row.update({"halo_bwd_s": round(bench_g(halo_loss), 6),
                    "xla_bwd_s": round(bench_g(xla_loss), 6)})
        row["halo_bwd_vs_xla"] = round(row["xla_bwd_s"]
                                       / row["halo_bwd_s"], 3)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
