"""Single-image / folder inference CLI (reference surface: src/demo.py).

    python -m centerpoly_tpu.infer.demo polydet --demo path/to/img.png \
        --arch dla_34 --load_model exp/.../model_best

Prints the reference's per-stage timing line (demo.py:50-53) and writes an
overlay image next to the input when --save_overlay is passed.
"""
from __future__ import annotations

import os
import sys

import numpy as np


IMG_EXTS = (".jpg", ".jpeg", ".png", ".webp", ".ppm")


def draw_overlay(image: np.ndarray, results, vis_thresh: float = 0.3):
    """OpenCV polygon overlay (reference debugger.add_polydet,
    src/lib/utils/debugger.py:214-234)."""
    import cv2

    out = image.copy()
    colors = [(np.array([((j * 67) % 255), ((j * 131) % 255),
                         ((j * 197) % 255)])).tolist()
              for j in range(32)]
    for cls_id, rows in results.items():
        for row in rows:
            if row[4] > vis_thresh:
                poly = np.asarray(row[5:-1]).reshape(-1, 2).astype(np.int32)
                cv2.polylines(out, [poly], True, colors[int(cls_id) % 32], 2)
                x0, y0 = int(row[0]), int(row[1])
                cv2.putText(out, f"{row[4]:.2f}", (x0, max(0, y0 - 3)),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                            colors[int(cls_id) % 32], 1)
    return out


def main(argv=None):
    from ..configs import Config
    from .detector import create_detector

    argv = list(sys.argv[1:] if argv is None else argv)
    save_overlay = "--save_overlay" in argv
    if save_overlay:
        argv.remove("--save_overlay")
    demo_path = None
    if "--demo" in argv:
        i = argv.index("--demo")
        demo_path = argv[i + 1]
        del argv[i:i + 2]
    cfg = Config.from_args(argv)

    # --load_model (orbax dir or reference .pth) loads in the constructor
    detector = create_detector(cfg)

    if demo_path is None:
        raise SystemExit("--demo <image-or-folder> is required")
    if os.path.isdir(demo_path):
        files = [os.path.join(demo_path, f)
                 for f in sorted(os.listdir(demo_path))
                 if f.lower().endswith(IMG_EXTS)]
    else:
        files = [demo_path]

    import cv2
    for path in files:
        img = cv2.imread(path)
        if img is None:
            print(f"skipping unreadable {path}")
            continue
        ret = detector.run(img)
        line = "".join(f"{s} {ret[s]:.3f}s |" for s in
                       ("tot", "load", "pre", "net", "dec", "post", "merge"))
        print(f"{os.path.basename(path)}: {line}")
        if save_overlay:
            out = draw_overlay(img, ret["results"], cfg.vis_thresh)
            out_path = os.path.splitext(path)[0] + "_polydet.png"
            cv2.imwrite(out_path, out)
            print(f"  overlay -> {out_path}")


if __name__ == "__main__":
    main()
