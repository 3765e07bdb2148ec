"""Throughput-optimal batch size sweep for the paper config.

The b=1 smallhourglass latency is at the memory roofline (RESULTS.md
"Roofline position"); the remaining throughput lever is batch.  This
sweeps batch sizes on the full pipeline (2048x1024 uint8 source frames
-> warp -> normalize -> forward -> decode) and prints frames/s/chip
per batch, scan-differenced.

    python experiments/bench_batch_sweep.py [--arch smallhourglass]
        [--batches 1,2,4,8,16]
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
    p.add_argument("--arch", default="smallhourglass")
    p.add_argument("--batches", default="1,2,4,8,16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from centerpoly_tpu.configs import Config
    from centerpoly_tpu.geometry.affine import warp_axis_aligned
    from centerpoly_tpu.infer.detector import PolydetDetector
    from centerpoly_tpu.utils.timing import measure_device_time

    cfg = Config(task="polydet", dataset="cityscapes", arch=args.arch,
                 input_h=512, input_w=1024)
    det = PolydetDetector(cfg)
    trans, _ = det.pre_process_meta(1024, 2048, 1.0)
    trans_dev = jax.device_put(jnp.asarray(trans, jnp.float32))
    mean_dev = jax.device_put(jnp.asarray(cfg.mean, jnp.float32))
    std_dev = jax.device_put(jnp.asarray(cfg.std, jnp.float32))
    rng = np.random.RandomState(0)

    best = None
    for b in [int(s) for s in args.batches.split(",") if s]:
        frames = jax.device_put(
            (rng.rand(b, 1024, 2048, 3) * 255).astype(np.uint8))

        def scalar_batch(eps, variables, frames_u8, trans, mean, std):
            warped = jax.vmap(lambda f: warp_axis_aligned(
                f.astype(jnp.float32) + eps, trans,
                (cfg.input_h, cfg.input_w)))(frames_u8)
            x = (warped / 255.0 - mean) / std
            _, dets = det._process_device(variables, x)
            return jnp.sum(dets.astype(jnp.float32))

        try:
            t = measure_device_time(
                scalar_batch,
                (det.variables, frames, trans_dev, mean_dev, std_dev),
                k_big=9, reps=3)
        except Exception as e:  # OOM at large batch ends the sweep
            print(json.dumps({"arch": args.arch, "batch": b,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
            break
        fps = b / t
        print(json.dumps({"arch": args.arch, "batch": b,
                          "ms_per_frame": round(t / b * 1e3, 3),
                          "frames_per_s_per_chip": round(fps, 1)}),
              flush=True)
        if best is None or fps > best[1]:
            best = (b, fps)
    if best:
        print(json.dumps({"arch": args.arch, "best_batch": best[0],
                          "best_frames_per_s_per_chip": round(best[1], 1)}),
              flush=True)


if __name__ == "__main__":
    main()
