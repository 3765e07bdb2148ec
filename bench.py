"""Benchmark: end-to-end polydet inference latency per 2048x1024 frame.

Measures the same quantity as the reference's published runtime (README.md:
0.045 s/frame on an RTX 2070, read off the detector stage timers,
base_detector.py:105-191): full pipeline — on-device preprocess (resize/
warp/normalize), DLA-34 forward, fused decode — on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline > 1 means faster than the reference's 0.045 s.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_S = 0.045  # reference README.md:9,46 (RTX 2070)


def main():
    import jax

    from centerpoly_tpu.configs import Config
    from centerpoly_tpu.infer.detector import PolydetDetector

    cfg = Config(task="polydet", dataset="cityscapes", arch="dla_34",
                 input_h=512, input_w=1024)
    det = PolydetDetector(cfg)

    rng = np.random.RandomState(0)
    frame = (rng.rand(1024, 2048, 3) * 255).astype(np.uint8)

    # warmup (compile)
    for _ in range(2):
        det.run(frame)

    lat = []
    for _ in range(10):
        t0 = time.perf_counter()
        out = det.run(frame)
        lat.append(time.perf_counter() - t0)
    p50 = float(np.median(lat))

    print(json.dumps({
        "metric": "polydet_dla34_2048x1024_p50_latency",
        "value": p50,
        "unit": "s/frame",
        "vs_baseline": BASELINE_S / p50,
    }))


if __name__ == "__main__":
    main()
