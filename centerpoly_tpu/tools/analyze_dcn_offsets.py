"""Measure learned DCN offset magnitudes to pick the kernel band R.

The bounded-offset Pallas kernels (kernels/dcn_halo.py: both axes;
kernels/dcn_rowband.py: y only, x exact) clamp offsets to [-R, R] —
the one deliberate deviation from the reference's unbounded CUDA DCN
(src/lib/models/networks/pose_dla_dcn.py:16).  Whether a given R is
lossless for a TRAINED model is an empirical question about that
model's offset-conv outputs.  This tool answers it: run the model on
one or more images with the `intermediates` collection enabled (DCNv2
sows its offsets), and report per-node |offset| percentiles plus the
fraction that an R-clamp would saturate.

    python -m centerpoly_tpu.tools.analyze_dcn_offsets polydet \\
        --arch dla_34 --load_model model.pth --demo img.png [--r 4]

With no --demo, a fixed random frame is used (meaningful only for a
loaded checkpoint; a fresh init has zero offsets by construction).
"""
from __future__ import annotations

import json

import numpy as np


def offset_stats(intermediates, r: float):
    """Flatten the sown `dcn_offsets` tree into per-node stat rows."""
    import jax

    rows = []
    flat = jax.tree_util.tree_leaves_with_path(intermediates)
    for path, leaf in flat:
        name = "/".join(
            getattr(p, "key", getattr(p, "name", str(p))) for p in path)
        if "dcn_offsets" not in name:
            continue
        off = np.abs(np.asarray(leaf, np.float32))
        oy = off[..., 0::2].ravel()
        ox = off[..., 1::2].ravel()
        rows.append({
            "node": name.replace("/dcn_offsets", ""),
            "shape": list(leaf.shape),
            "y_p50": round(float(np.percentile(oy, 50)), 3),
            "y_p99": round(float(np.percentile(oy, 99)), 3),
            "y_p999": round(float(np.percentile(oy, 99.9)), 3),
            "y_max": round(float(oy.max()), 3),
            "x_p99": round(float(np.percentile(ox, 99)), 3),
            "x_max": round(float(ox.max()), 3),
            "y_frac_clamped_at_r": round(float((oy > r).mean()), 6),
            "xy_frac_clamped_at_r": round(
                float((np.abs(off) > r).mean()), 6),
        })
    return rows


def collect(cfg, variables=None, image=None):
    """Apply the model once with intermediates enabled; return stats
    rows for every DCN node."""
    import jax
    import jax.numpy as jnp

    from ..infer.detector import create_detector

    det = create_detector(cfg, variables=variables)
    if image is None:
        image = (np.random.RandomState(0).rand(
            cfg.input_h, cfg.input_w, 3) * 255).astype(np.uint8)
    trans, meta = det.pre_process_meta(image.shape[0], image.shape[1], 1.0)
    img = det._pre_jit(jnp.asarray(image), jnp.asarray(trans),
                       det.mean, det.std,
                       (meta["inp_h"], meta["inp_w"]))

    def run(variables, img):
        return det.model.apply(variables, img, train=False,
                               mutable=["intermediates"])

    _, inter = jax.jit(run)(det.variables, img)
    return inter


def main(argv=None):
    import argparse
    import sys

    from ..configs import Config

    argv = list(sys.argv[1:] if argv is None else argv)
    demo, r = None, 4.0
    if "--demo" in argv:
        i = argv.index("--demo")
        demo = argv[i + 1]
        del argv[i:i + 2]
    if "--r" in argv:
        i = argv.index("--r")
        r = float(argv[i + 1])
        del argv[i:i + 2]
    cfg = Config.from_args(argv)

    image = None
    if demo:
        try:
            import cv2
            image = cv2.imread(demo)
            if image is None:
                raise SystemExit(f"cannot read image: {demo}")
            image = image[:, :, ::-1]
        except ImportError:
            from PIL import Image
            image = np.asarray(Image.open(demo).convert("RGB"))

    inter = collect(cfg, image=image)
    rows = offset_stats(inter, r)
    worst_y = 0.0   # rowband clamps y only
    worst_xy = 0.0  # halo clamps BOTH axes
    for row in rows:
        row["r"] = r
        worst_y = max(worst_y, row["y_frac_clamped_at_r"])
        worst_xy = max(worst_xy, row["xy_frac_clamped_at_r"])
        print(json.dumps(row))
    print(json.dumps({
        "summary": "offset clamp saturation across nodes at R",
        "r": r,
        "worst_node_frac_y": worst_y,
        "worst_node_frac_xy": worst_xy,
        "lossless_rowband": worst_y == 0.0,
        "lossless_halo": worst_xy == 0.0,
    }))


if __name__ == "__main__":
    main()
