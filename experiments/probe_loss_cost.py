"""Offline decomposition of the polydet train-step cost: compile the
LOSS (+ its gradient wrt the head maps) alone on CPU and read XLA cost
analysis — no chip needed.

Queue5 measured the full rowband train step at 5.68 s/step (b8,
focal+l1+iou+order) against an expected ~0.6-0.8 s from the known
model fwd/bwd parts; this probe says whether the polygon-IoU loss
gradient plausibly accounts for the gap (its FLOPs/bytes vs the
model's), before the on-chip l1-only ablation (queue6) lands.

    python experiments/probe_loss_cost.py [--batch 8] [--poly_loss l1+iou]
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
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--h", type=int, default=128, help="output map H")
    p.add_argument("--w", type=int, default=256, help="output map W")
    p.add_argument("--rep", default="polar")
    p.add_argument("--poly_loss", default="l1+iou")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from centerpoly_tpu.configs import Config
    from centerpoly_tpu.losses import polydet_loss
    from centerpoly_tpu.train.trainer import loss_config_for

    cfg = Config(task="polydet", dataset="cityscapes", arch="dla_34",
                 input_h=args.h * 4, input_w=args.w * 4,
                 batch_size=args.batch, poly_loss=args.poly_loss,
                 poly_order=args.rep == "polar", rep=args.rep)
    loss_cfg = loss_config_for(cfg)

    b, k, n2 = args.batch, cfg.max_objs, cfg.nbr_points * 2
    oh, ow = args.h, args.w
    rng = np.random.RandomState(0)
    radii = rng.uniform(2, 20, (b, k, cfg.nbr_points))
    angles = np.sort(rng.uniform(0, 2 * np.pi, (b, k, cfg.nbr_points)), -1)
    poly = np.empty((b, k, n2), np.float32)
    poly[..., 0::2] = radii
    poly[..., 1::2] = angles
    batch = {
        "hm": np.zeros((b, oh, ow, cfg.num_classes), np.float32),
        "reg_mask": (rng.rand(b, k) < 0.25).astype(np.float32),
        "ind": rng.randint(0, oh * ow, (b, k)).astype(np.int32),
        "poly": poly,
        "pseudo_depth": rng.rand(b, k, 1).astype(np.float32),
        "reg": rng.rand(b, k, 2).astype(np.float32),
    }
    batch["hm"][:, 5, 5, 0] = 1.0
    batch = {kk: jnp.asarray(v) for kk, v in batch.items()}

    outs = {
        "hm": jnp.asarray(rng.randn(b, oh, ow, cfg.num_classes),
                          jnp.float32),
        "poly": jnp.asarray(rng.randn(b, oh, ow, n2), jnp.float32),
        "pseudo_depth": jnp.asarray(rng.randn(b, oh, ow, 1), jnp.float32),
        "reg": jnp.asarray(rng.randn(b, oh, ow, 2), jnp.float32),
    }

    def scalar_loss(outs):
        loss, _ = polydet_loss([outs], batch, loss_cfg)
        return loss

    def report(name, fn, *a):
        try:
            c = jax.jit(fn).lower(*a).compile()
            ca = c.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            print(json.dumps({
                "program": name,
                "gflop": round(float(ca.get("flops", 0)) / 1e9, 3),
                "gbytes": round(
                    float(ca.get("bytes accessed", 0)) / 1e9, 3),
                "mxu_floor_ms_197tflops": round(
                    float(ca.get("flops", 0)) / 197e12 * 1e3, 3),
                "bw_floor_ms_819gbps": round(
                    float(ca.get("bytes accessed", 0)) / 819e9 * 1e3, 3),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"program": name,
                              "error": str(e).splitlines()[0][:200]}),
                  flush=True)

    report(f"loss_fwd({args.poly_loss},{args.rep})", scalar_loss, outs)
    report(f"loss_grad({args.poly_loss},{args.rep})",
           jax.grad(scalar_loss), outs)


if __name__ == "__main__":
    main()
