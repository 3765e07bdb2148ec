"""BASELINE config #5 benchmark: Hourglass + full loss (focal +
Weiler-Atherton polygon IoU + order) train step on a Cityscapes-shaped
mini-batch.

Measures compile time and steady-state step time of the jitted train step
(the reference runs this loss as a Python per-object loop on GPU tensors,
trains/polydet.py:38-162 + losses.py:833-959).

    python experiments/bench_train_iou.py [--arch smallhourglass]
        [--batch 4] [--h 512] [--w 1024]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="smallhourglass")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--h", type=int, default=512)
    p.add_argument("--w", type=int, default=1024)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--poly_loss", default="l1+iou")
    p.add_argument("--rep", default="polar")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--ab_forms", default="",
                   help="comma-separated DCN formulations: run the FULL "
                        "train step once per formulation (applied "
                        "uniformly to every DCN node) and report the "
                        "winner — the train-mode analogue of "
                        "profile_inference --ab_forms (per-shape "
                        "isolated winners mix badly at model level, "
                        "measured round 4)")
    p.add_argument("--write_table", action="store_true",
                   help="with --ab_forms: write the measured full-model "
                        "winner into the production auto table's "
                        "TRAIN keys (b,h,w,cin,1) for this arch/batch")
    args = p.parse_args()

    if args.ab_forms:
        forms = [f.strip() for f in args.ab_forms.split(",") if f.strip()]
        results = {}
        for form in forms:
            os.environ["CENTERPOLY_DCN_FORMULATION"] = form
            # fresh process per form: the formulation gate is read at
            # trace time and jit caches key on the traced program
            import subprocess
            import sys as _sys
            child = [a for a in _sys.argv if not a.startswith(
                "--ab_forms") and a != args.ab_forms
                and a != "--write_table"]
            proc = subprocess.run([_sys.executable] + child,
                                  capture_output=True, text=True,
                                  env=os.environ.copy())
            sys.stdout.write(proc.stdout)
            sys.stderr.write(proc.stderr)
            if proc.returncode != 0:
                print(json.dumps({"ab_form": form, "error": "failed"}),
                      flush=True)
                continue
            rec = json.loads(proc.stdout.strip().splitlines()[-1])
            results[form] = rec["step_s"]
            print(json.dumps({"ab_form": form,
                              "train_step_s": rec["step_s"]}), flush=True)
        if not results:
            raise SystemExit("every ab form failed")
        winner = min(results, key=results.get)
        print(json.dumps({"ab_winner_train": winner}), flush=True)
        if args.write_table and args.arch == "dla_34":
            # DLA-34 train node shape classes (strides 4/8/16/32)
            sh, sw = args.h // 4, args.w // 4
            b = args.batch
            keys = [f"{b},{sh},{sw},64,1",
                    f"{b},{sh // 2},{sw // 2},128,1",
                    f"{b},{sh // 4},{sw // 4},256,1",
                    f"{b},{sh // 8},{sw // 8},512,1"]
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
                json.dump(table, f, indent=1, sort_keys=True)
            print(json.dumps({"wrote_table": path, "keys": keys,
                              "winner": winner}), flush=True)
        return

    rec = measure_train_step(
        arch=args.arch, batch=args.batch, h=args.h, w=args.w,
        poly_loss=args.poly_loss, rep=args.rep, dtype=args.dtype,
        steps=args.steps)
    print(json.dumps(rec))


def measure_train_step(arch="dla_34", batch=8, h=512, w=1024,
                       poly_loss="l1+iou", rep="polar", dtype="bfloat16",
                       steps=8):
    """Build + honestly time one jitted train step; returns a record dict.

    Shared by this script's CLI and bench.py's training secondary — both
    must trace the IDENTICAL program so the persistent compile cache and
    the recorded numbers line up.
    """
    import jax
    from centerpoly_tpu.configs import Config
    from centerpoly_tpu.models import create_model
    from centerpoly_tpu.train import create_train_state, make_train_step
    from centerpoly_tpu.train.trainer import loss_config_for

    cfg = Config(task="polydet", dataset="cityscapes", arch=arch,
                 input_h=h, input_w=w, batch_size=batch,
                 poly_loss=poly_loss, poly_order=rep == "polar",
                 rep=rep, elliptical_gt=True, train_dtype=dtype)
    import jax.numpy as jnp
    jdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    model = create_model(cfg.arch, cfg.heads, cfg.head_conv, dtype=jdtype)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, cfg.input_h, cfg.input_w, 3),
        base_lr=cfg.lr, lr_steps=cfg.lr_step, steps_per_epoch=100)
    step = make_train_step(loss_config_for(cfg))

    b, k, n2 = batch, cfg.max_objs, cfg.nbr_points * 2
    oh, ow = cfg.output_h, cfg.output_w
    rng = np.random.RandomState(0)
    # polar GT: radii + sorted angles so the IoU clip sees realistic input
    radii = rng.uniform(2, 20, (b, k, cfg.nbr_points))
    angles = np.sort(rng.uniform(0, 2 * np.pi, (b, k, cfg.nbr_points)), -1)
    poly = np.empty((b, k, n2), np.float32)
    poly[..., 0::2] = radii
    poly[..., 1::2] = angles
    batch_d = {
        "input": rng.randn(b, cfg.input_h, cfg.input_w, 3).astype(
            np.float32),
        "hm": np.zeros((b, oh, ow, cfg.num_classes), np.float32),
        "reg_mask": (rng.rand(b, k) < 0.25).astype(np.float32),
        "ind": rng.randint(0, oh * ow, (b, k)).astype(np.int32),
        "poly": poly,
        "pseudo_depth": rng.rand(b, k, 1).astype(np.float32),
        "reg": rng.rand(b, k, 2).astype(np.float32),
    }
    batch_d["hm"][:, 5, 5, 0] = 1.0

    # device_put the batch ONCE: the step loop must time device compute,
    # not re-transfer of the 50 MB host batch through the tunnel every
    # dispatch (measured 2026-08-19: the same duo_tapwise config timed
    # 0.075 s/step vs 0.024 s for its siblings purely on tunnel state;
    # production input pipelines prefetch to device, so on-device inputs
    # are the honest frames/s/chip contract)
    batch_d = jax.device_put(batch_d)
    t0 = time.perf_counter()
    state0, stats = step(state, batch_d)
    compile_s = time.perf_counter() - t0
    loss0 = float(stats["loss"])  # fetch = the only real fence on axon

    # TIMING: scan-differenced on-device seconds per step.  A Python
    # dispatch loop + block_until_ready measured 0.0051 s/step at "MFU
    # 3.11" (impossible, >1.0) on 2026-08-19 because block_until_ready
    # acknowledges DISPATCH, not execution, through the axon tunnel —
    # probe_timer_calibration.py clocks that methodology at 66,000
    # "TFLOP/s" on a 197-TFLOP/s chip.  measure_device_time runs the
    # step k times inside one compiled scan with a data-dependent carry
    # and differences two k values, so RTT and dispatch cancel.
    from centerpoly_tpu.utils.timing import measure_device_time, scalarize

    def one_step(inp, state_arg, batch_rest):
        # state0, not state: step donates argnum 0, so the pre-compile
        # state's buffers are dead after the first call.  Fresh state
        # each iteration is NOT what production does (state advances),
        # but for steady-state cost the program is identical; scalarize
        # sums every output leaf (params, opt state, stats) so the
        # optimizer update cannot be dead-code-eliminated.
        #
        # state/batch MUST be jit ARGUMENTS, not closure constants: on
        # this stack XLA rewrites dots/convs with large constant
        # operands into a much slower form (bench.py header; measured
        # 2026-08-20: the closure-constant version of this bench timed
        # the rowband b8 train step at 5.68 s/step — every other bench
        # in the repo already passes variables as arguments).
        return step(state_arg, dict(batch_rest, input=inp))

    batch_rest = {k2: v for k2, v in batch_d.items() if k2 != "input"}
    step_s = measure_device_time(
        scalarize(one_step), [batch_d["input"], state0, batch_rest],
        k_small=1, k_big=1 + steps, reps=3)

    # MFU: compiled-program flops / (step time * chip peak bf16)
    peak = {  # bf16 peak FLOP/s per chip by device kind
        "v4": 275e12, "v5e": 197e12, "v5p": 459e12, "v6e": 918e12,
    }
    kind = jax.devices()[0].device_kind.lower()
    peak_flops = next((v for k2, v in peak.items() if k2 in kind), 197e12)
    mfu = None
    try:
        ca = step.lower(state0, batch_d).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        if flops > 0:
            mfu = flops / (step_s * peak_flops)
    except Exception:
        pass

    return {
        "config": f"{arch} {batch}x{h}x{w} "
                  f"focal+{poly_loss}"
                  f"{'+order' if cfg.poly_order else ''} ({rep}, "
                  f"{dtype})",
        "compile_s": round(compile_s, 2),
        "step_s": round(step_s, 4),
        "frames_per_s": round(batch / step_s, 1),
        "mfu": round(mfu, 4) if mfu is not None else None,
        "device_kind": jax.devices()[0].device_kind,
        "loss": loss0,
    }


if __name__ == "__main__":
    main()
