"""Honest per-component device-time profile of the polydet pipeline.

Uses scan-differencing (utils/timing.py) because wall-clock fences lie on
this harness.  Components: warp, DLA trunk, full DLA-34 forward (trunk +
DCN upsampling + heads), decode, full pipeline, and the dlav0 (no-DCN)
forward for contrast — the difference isolates the 18 DCNv2 nodes.

    python experiments/profile_inference.py [--arch dla_34]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def ab_full_model(args):
    """Full-model DCN formulation A/B: measure the dla_34 full pipeline
    (warp + forward + decode, the span of the published 0.045 s/frame)
    once per candidate formulation, applied uniformly to every DCN node.

    With --write_table, the winner is written to every dla_34 inference
    shape key so `auto` (models/deform_conv.py:resolve_formulation)
    resolves model-consistently.  This replaces per-shape microbench
    priming: isolated-shape winners measured 63.1 ms/frame mixed into
    the full model vs 35.0 ms for uniform duo (on-chip, round 4).
    """
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
    import jax
    import jax.numpy as jnp
    from centerpoly_tpu.configs import Config
    from centerpoly_tpu.geometry.affine import warp_axis_aligned
    from centerpoly_tpu.infer.detector import PolydetDetector
    from centerpoly_tpu.models.deform_conv import FORMULATIONS
    from centerpoly_tpu.utils.timing import measure_device_time

    forms = [f.strip() for f in args.ab_forms.split(",") if f.strip()]
    unknown = [f for f in forms if f not in FORMULATIONS]
    if unknown:
        raise SystemExit(f"unknown formulations {unknown}; "
                         f"known: {sorted(FORMULATIONS)}")

    rng = np.random.RandomState(0)
    frame = jax.device_put(
        (rng.rand(args.h * 2, args.w * 2, 3) * 255).astype(np.uint8))
    results = {}
    for form in forms:
        os.environ["CENTERPOLY_DCN_FORMULATION"] = form
        cfg = Config(task="polydet", dataset="cityscapes", arch="dla_34",
                     input_h=args.h, input_w=args.w)
        det = PolydetDetector(cfg)
        trans, _ = det.pre_process_meta(args.h * 2, args.w * 2, 1.0)
        trans_dev = jax.device_put(jnp.asarray(trans, jnp.float32))
        mean_dev = jax.device_put(jnp.asarray(cfg.mean, jnp.float32))
        std_dev = jax.device_put(jnp.asarray(cfg.std, jnp.float32))

        def full(eps, variables, frame, trans, mean, std):
            im = warp_axis_aligned(frame.astype(jnp.float32) + eps,
                                   trans, (cfg.input_h, cfg.input_w))
            im = ((im / 255.0 - mean) / std)[None]
            _, dets = det._process_device(variables, im)
            return jnp.sum(dets.astype(jnp.float32))

        seconds = measure_device_time(
            full, (det.variables, frame, trans_dev, mean_dev, std_dev))
        results[form] = seconds
        print(json.dumps({"ab_form": form,
                          "full_pipeline_device_ms":
                              round(seconds * 1e3, 3)}), flush=True)
        del det

    winner = min(results, key=results.get)
    print(json.dumps({"ab_winner": winner}), flush=True)
    if args.write_table:
        # the four DLA-34 DCN node shape classes at stride-4 inference
        # (b=1; strides 4/8/16/32 with ch 64/128/256/512); kept in sync
        # with bench.py's priming key list and regression-tested against
        # an actual model trace (tests/test_train.py
        # test_auto_table_keys_cover_dla34_inference)
        sh, sw = args.h // 4, args.w // 4
        keys = [f"1,{sh},{sw},64,0", f"1,{sh // 2},{sw // 2},128,0",
                f"1,{sh // 4},{sw // 4},256,0",
                f"1,{sh // 8},{sw // 8},512,0"]
        path = os.environ.get(
            "CENTERPOLY_DCN_AUTO_TABLE",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "dcn_auto_table.json"))
        try:
            with open(path) as f:
                table = json.load(f)
        except (OSError, ValueError):
            table = {}
        table.update({k: winner for k in keys})
        with open(path, "w") as f:
            json.dump(table, f, indent=1)
        print(json.dumps({"wrote_table": path, "keys": keys,
                          "winner": winner}), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--h", type=int, default=512)
    p.add_argument("--w", type=int, default=1024)
    p.add_argument("--archs", default="dla_34,dlav0_34",
                   help="comma-separated arch list; the DCN/decomposition "
                        "sub-probes only run for dla_34")
    p.add_argument("--ab_forms", default="",
                   help="comma-separated DCN formulations: run ONLY the "
                        "dla_34 full_pipeline probe once per formulation "
                        "(uniform across every DCN node) and report each")
    p.add_argument("--write_table", action="store_true",
                   help="with --ab_forms: write the measured full-model "
                        "winner into experiments/dcn_auto_table.json for "
                        "ALL dla inference shape keys (model-consistent "
                        "selection; per-layer mixing measured 63 ms vs "
                        "uniform duo 35 ms in the round-4 on-chip A/B)")
    args = p.parse_args()

    if args.ab_forms:
        ab_full_model(args)
        return

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
    import jax
    import jax.numpy as jnp
    from centerpoly_tpu.configs import Config
    from centerpoly_tpu.geometry.affine import warp_axis_aligned
    from centerpoly_tpu.infer.detector import PolydetDetector
    from centerpoly_tpu.utils.timing import measure_device_time

    rows = {}

    def report(name, seconds):
        rows[name] = seconds
        print(json.dumps({"component": name,
                          "device_ms": round(seconds * 1e3, 3)}),
              flush=True)

    rng = np.random.RandomState(0)

    for arch in [a.strip() for a in args.archs.split(",") if a.strip()]:
        cfg = Config(task="polydet", dataset="cityscapes", arch=arch,
                     input_h=args.h, input_w=args.w)
        det = PolydetDetector(cfg)
        img = jax.device_put(
            rng.randn(1, cfg.input_h, cfg.input_w, 3).astype(np.float32))

        def fwd(eps, variables, img):
            outs = det.model.apply(variables, img + eps, train=False)
            return sum(jnp.sum(v.astype(jnp.float32))
                       for v in outs[-1].values())

        report(f"{arch}_forward",
               measure_device_time(fwd, (det.variables, img)))

        if arch == "dla_34":
            # trunk only (no DCN upsampling, no heads): DLASeg is
            # nn.compact, so time its "base" DLA submodule directly
            # with the sub-variables scoped to it
            from centerpoly_tpu.models.dla import DLA
            base_mod = DLA(dtype=det.model.dtype)
            base_vars = {col: tree["base"]
                         for col, tree in det.variables.items()
                         if "base" in tree}

            def trunk(eps, variables, img):
                feats = base_mod.apply(variables, img + eps, train=False)
                return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)

            try:
                report("dla_34_trunk",
                       measure_device_time(trunk, (base_vars, img)))
            except Exception as e:
                print("trunk probe skipped:", type(e).__name__, e,
                      flush=True)

        # full pipeline (warp + forward + decode) — the span comparable
        # to the reference's published 0.045 s/frame
        frame = jax.device_put(
            (rng.rand(args.h * 2, args.w * 2, 3) * 255).astype(np.uint8))
        trans, _ = det.pre_process_meta(args.h * 2, args.w * 2, 1.0)
        trans_dev = jax.device_put(jnp.asarray(trans, jnp.float32))
        mean_dev = jax.device_put(jnp.asarray(cfg.mean, jnp.float32))
        std_dev = jax.device_put(jnp.asarray(cfg.std, jnp.float32))

        if arch == "dla_34":
            def warp_only(eps, frame, trans, mean, std):
                im = warp_axis_aligned(frame.astype(jnp.float32) + eps,
                                       trans, (cfg.input_h, cfg.input_w))
                return jnp.sum(((im / 255.0 - mean) / std))

            report("warp_normalize",
                   measure_device_time(
                       warp_only, (frame, trans_dev, mean_dev, std_dev)))

        def full(eps, variables, frame, trans, mean, std):
            im = warp_axis_aligned(frame.astype(jnp.float32) + eps,
                                   trans, (cfg.input_h, cfg.input_w))
            im = ((im / 255.0 - mean) / std)[None]
            _, dets = det._process_device(variables, im)
            return jnp.sum(dets.astype(jnp.float32))

        report("full_pipeline" if arch == "dla_34"
               else f"{arch}_full_pipeline",
               measure_device_time(
                   full, (det.variables, frame, trans_dev, mean_dev,
                          std_dev)))

        if arch == "dla_34":
            # decode on fixed head maps
            outs = jax.jit(lambda v, x: det.model.apply(v, x, train=False))(
                det.variables, img)
            head_maps = {k: jax.device_put(np.asarray(v))
                         for k, v in outs[-1].items()}

            def decode_only(eps, head_maps):
                hm = {k: (v + eps.astype(v.dtype) if k == "hm" else v)
                      for k, v in head_maps.items()}
                from centerpoly_tpu.ops.decode import polydet_decode
                dets = polydet_decode(
                    hm["hm"], hm["poly"], hm["pseudo_depth"],
                    reg=hm.get("reg"), k=cfg.K, rep=cfg.rep)
                return jnp.sum(dets.astype(jnp.float32))

            try:
                report("decode",
                       measure_device_time(decode_only, (head_maps,)))
            except Exception as e:
                print("decode probe skipped:", type(e).__name__, repr(e),
                      flush=True)

    if "dla_34_forward" in rows and "dlav0_34_forward" in rows:
        print(json.dumps({
            "component": "dcn_upsampling_cost (dla34 - dlav0)",
            "device_ms": round((rows["dla_34_forward"]
                                - rows["dlav0_34_forward"]) * 1e3, 3)}))


if __name__ == "__main__":
    main()
