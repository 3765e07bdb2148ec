"""Honest (scan-differenced) device-time comparison of DCNv2 forward
formulations at the DLA-34 inference node shapes.

Variants: XLA 4-corner gather (production), pairwise 2C-slice gather,
tapwise, Pallas halo kernel (R=4, clamped-offset semantics), and a plain
3x3 conv as the speed-of-light floor (the DCN contraction does the same
MXU work; everything above the floor is sampling overhead).

    python experiments/bench_dcn_variants.py [--batch 1] [--dtype bfloat16]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--halo_r", type=int, default=4)
    p.add_argument("--write_table", action="store_true",
                   help="record the fastest XLA formulation per shape "
                        "into experiments/dcn_shape_table.json (RESEARCH "
                        "output: per-shape isolated winners, which the "
                        "round-4 full-model A/B measured at 63 ms vs "
                        "uniform duo's 35 ms — they must NOT feed "
                        "production selection; the production table "
                        "dcn_auto_table.json is written only by the "
                        "full-model A/B in profile_inference.py, or "
                        "explicitly via CENTERPOLY_DCN_AUTO_TABLE)")
    p.add_argument("--train", action="store_true",
                   help="time the TRAINING step (fwd + full backward via "
                        "jax.grad) instead of the forward, and tag table "
                        "entries as train-time")
    p.add_argument("--variants", default=None,
                   help="comma-separated subset of xla_4corner,xla_quad,"
                        "xla_duo,xla_tapwise,xla_quad_tapwise,"
                        "xla_duo_tapwise,pallas_halo to time "
                        "(default: all). bench.py's self-priming pre-step "
                        "uses xla_tapwise,xla_quad,xla_duo for a lean shoot-out")
    p.add_argument("--no_floor", action="store_true",
                   help="skip the plain-conv3x3 speed-of-light floor row "
                        "(saves 2 compiles/shape when only the table "
                        "matters)")
    p.add_argument("--shapes", default=None,
                   help="semicolon-separated h,w,cin,cout overrides for "
                        "the default DLA-34 inference node shapes, e.g. "
                        "'32,64,256,256;64,128,128,128'")
    args = p.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        # sitecustomize imports jax before env vars are read; re-apply
        # so `JAX_PLATFORMS=cpu python experiments/...` works standalone
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    from centerpoly_tpu.models.deform_conv import (
        deform_conv2d, deform_conv2d_duo, deform_conv2d_duo_tapwise,
        deform_conv2d_pairs, deform_conv2d_quad,
        deform_conv2d_quad_tapwise, deform_conv2d_tapwise)
    from centerpoly_tpu.utils.timing import measure_device_time

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    b = args.batch
    # DLA-34 @ 512x1024 inference feature shapes (stride 4/8/16)
    shapes = [(b, 128, 256, 64, 64),
              (b, 64, 128, 128, 128),
              (b, 32, 64, 256, 256)]
    if args.shapes:
        shapes = []
        for spec in args.shapes.split(";"):
            h, w, cin, cout = (int(v) for v in spec.split(","))
            shapes.append((b, h, w, cin, cout))
    rng = np.random.RandomState(0)
    R = float(args.halo_r)

    for (bb, h, w, cin, cout) in shapes:
        x = jnp.asarray(rng.randn(bb, h, w, cin), dt)
        # clamped offsets so ALL variants (incl. halo) compute the same fn
        off = jnp.clip(jnp.asarray(rng.randn(bb, h, w, 18) * 2, dt), -R, R)
        mask = jnp.asarray(rng.rand(bb, h, w, 9), dt)
        wgt = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, dt)
        bias = jnp.zeros((cout,), dt)

        variants = {
            "xla_4corner": lambda *a: deform_conv2d(*a),
            "xla_quad": lambda *a: deform_conv2d_quad(*a),
            "xla_duo": lambda *a: deform_conv2d_duo(*a),
            "xla_tapwise": lambda *a: deform_conv2d_tapwise(*a),
            "xla_quad_tapwise": lambda *a: deform_conv2d_quad_tapwise(*a),
            "xla_duo_tapwise": lambda *a: deform_conv2d_duo_tapwise(*a),
        }
        if os.environ.get("BENCH_PAIRS"):
            variants["xla_pairs"] = lambda *a: deform_conv2d_pairs(*a)
        try:
            from centerpoly_tpu.kernels.dcn_halo import (
                deform_conv2d_halo, halo_supported)
            if halo_supported(h, w, cin, cout, int(R), dtype=dt):
                variants["pallas_halo"] = (
                    lambda *a: deform_conv2d_halo(*a, int(R)))
        except Exception:
            pass

        if args.variants:
            keep = {v.strip() for v in args.variants.split(",") if v.strip()}
            known = {"xla_4corner", "xla_quad", "xla_duo",
                     "xla_tapwise", "xla_quad_tapwise",
                     "xla_duo_tapwise", "xla_pairs", "pallas_halo"}
            unknown = keep - known
            if unknown:
                raise SystemExit(f"unknown --variants {sorted(unknown)}; "
                                 f"available: {sorted(known)}")
            variants = {n: f for n, f in variants.items() if n in keep}

        row = {"shape": f"{bb}x{h}x{w}x{cin}->{cout}"}

        if not args.no_floor:
            # floor: plain 3x3 conv (same MXU work as the DCN contraction)
            def conv_floor(eps, x, wgt):
                return jnp.sum(jax.lax.conv_general_dilated(
                    (x + eps.astype(x.dtype)), wgt, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32))

            row["conv3x3_floor_ms"] = round(
                measure_device_time(conv_floor, (x, wgt)) * 1e3, 3)

        ref = None
        for name, fn in variants.items():
            out = jax.jit(fn)(x, off, mask, wgt, bias)
            outf = np.asarray(out.astype(jnp.float32))
            if ref is None:
                ref = outf
            else:
                rel = float(np.max(np.abs(outf - ref))
                            / (np.max(np.abs(ref)) + 1e-9))
                row[f"{name}_relerr"] = round(rel, 5)

            if args.train:
                # time what training runs: forward + the FULL backward
                # (dx for the residual chain, doff/dmask for the offset
                # conv, dw for the weights)
                def scalar(eps, x, off, mask, wgt, bias, fn=fn):
                    def loss(x, off, mask, wgt):
                        return jnp.sum(fn(x, off, mask, wgt, bias)
                                       .astype(jnp.float32) ** 2)
                    gs = jax.grad(loss, argnums=(0, 1, 2, 3))(
                        x + eps.astype(x.dtype), off, mask, wgt)
                    return sum(jnp.sum(g.astype(jnp.float32)) for g in gs)
            else:
                def scalar(eps, x, off, mask, wgt, bias, fn=fn):
                    return jnp.sum(fn(x + eps.astype(x.dtype), off, mask,
                                      wgt, bias).astype(jnp.float32))

            row[f"{name}_ms"] = round(measure_device_time(
                scalar, (x, off, mask, wgt, bias)) * 1e3, 3)

        print(json.dumps(row), flush=True)

        if args.write_table:
            # fastest XLA formulation -> auto-table entry for this shape
            if (jax.default_backend() == "cpu"
                    and not os.environ.get("CENTERPOLY_ALLOW_CPU_TABLE")):
                # the table steers PRODUCTION TPU formulation choice;
                # CPU gather relative costs are not transferable
                print("# refusing to write CPU timings into the auto "
                      "table (set CENTERPOLY_ALLOW_CPU_TABLE=1 to force)",
                      flush=True)
                continue
            xla_names = {"xla_4corner": "fused", "xla_quad": "quad",
                         "xla_duo": "duo",
                         "xla_tapwise": "tapwise",
                         "xla_quad_tapwise": "quad_tapwise",
                         "xla_duo_tapwise": "duo_tapwise"}
            timed = [n for n in xla_names if f"{n}_ms" in row]
            if not timed:
                continue
            best = min(timed, key=lambda n: row[f"{n}_ms"])
            table_path = os.environ.get(
                "CENTERPOLY_DCN_AUTO_TABLE",
                os.path.join(os.path.dirname(
                    os.path.abspath(__file__)), "dcn_shape_table.json"))
            try:
                with open(table_path) as f:
                    table = json.load(f)
            except (OSError, ValueError):
                table = {}
            key = f"{bb},{h},{w},{cin},{int(args.train)}"
            table[key] = xla_names[best]
            with open(table_path, "w") as f:
                json.dump(table, f, indent=1, sort_keys=True)
            print(f"# table[{key}] = {xla_names[best]}", flush=True)


if __name__ == "__main__":
    main()
