"""Benchmark: polydet on-device latency per 2048x1024 frame.

Measures the same semantic span as the reference's published runtime
(README.md: 0.045 s/frame on an RTX 2070, read off the detector stage
timers base_detector.py:105-191 — image array in memory -> detections):
here the whole span runs on one TPU chip as a single compiled program:

    uint8 2048x1024 frame (device-resident) -> affine warp + normalize
    -> DLA-34 forward (bf16) -> sigmoid/peak-NMS/top-K polygon decode
    -> (K, 6+2N+1) detections

TIMING SEMANTICS (measured on this axon harness 2026-08-17): device I/O
is tunneled over a network; `block_until_ready` acknowledges DISPATCH,
not execution, and any dispatch+fetch round trip pays a ~40 ms RTT.
Neither wall-clock fencing nor fence-once pipelining measures the chip.
The number reported here is the true on-device execution time, obtained
by running the frame pipeline k times inside one compiled program with a
data-dependent carry (so XLA can neither elide nor overlap iterations),
fetching one scalar, and differencing k=1 vs k=17 so RTT and dispatch
overhead cancel (centerpoly_tpu/utils/timing.py).

IMPORTANT perf note for this TPU stack: every device array the compiled
program needs is passed as a jit *argument* (variables, frame, transform,
mean, std).  Closing over a jnp array embeds it as an XLA constant, which
on this stack compiles pathologically and degrades every subsequent
dispatch in the process ~100x (0.5 ms -> 40 ms measured).

Prints ONE JSON line per metric {"metric", "value", "unit",
"vs_baseline"}; the PRIMARY metric is the LAST line.
vs_baseline > 1 means faster than the reference's 0.045 s.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_S = 0.045  # reference README.md:9,46 (RTX 2070)


def main():
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import jax
    import jax.numpy as jnp

    from centerpoly_tpu.configs import Config
    from centerpoly_tpu.geometry.affine import warp_axis_aligned
    from centerpoly_tpu.infer.detector import PolydetDetector
    from centerpoly_tpu.utils.timing import measure_device_time

    cfg = Config(task="polydet", dataset="cityscapes", arch="dla_34",
                 input_h=512, input_w=1024)
    det = PolydetDetector(cfg)

    rng = np.random.RandomState(0)
    frame = jax.device_put((rng.rand(1024, 2048, 3) * 255).astype(np.uint8))
    trans, _ = det.pre_process_meta(1024, 2048, 1.0)
    trans_dev = jax.device_put(jnp.asarray(trans, dtype=jnp.float32))
    mean_dev = jax.device_put(jnp.asarray(cfg.mean, jnp.float32))
    std_dev = jax.device_put(jnp.asarray(cfg.std, jnp.float32))

    def scalar_pipeline(eps, variables, frame_u8, trans, mean, std):
        img = warp_axis_aligned(frame_u8.astype(jnp.float32) + eps, trans,
                                (cfg.input_h, cfg.input_w))
        img = ((img / 255.0 - mean) / std)[None]
        _, dets = det._process_device(variables, img)
        return jnp.sum(dets.astype(jnp.float32))

    device_s = measure_device_time(
        scalar_pipeline,
        (det.variables, frame, trans_dev, mean_dev, std_dev))

    # secondary: end-to-end wall latency for one frame including the
    # tunnel round trip (dispatch + execute + fetch detections) — the
    # number a REMOTE client of this chip would see; a co-located host
    # pays the device time plus PCIe-scale copies only
    def pipeline(variables, frame_u8, trans, mean, std):
        img = warp_axis_aligned(frame_u8.astype(jnp.float32), trans,
                                (cfg.input_h, cfg.input_w))
        img = ((img / 255.0 - mean) / std)[None]
        _, dets = det._process_device(variables, img)
        return dets

    fn = jax.jit(pipeline)
    np.asarray(fn(det.variables, frame, trans_dev, mean_dev, std_dev))
    fenced = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(fn(det.variables, frame, trans_dev, mean_dev, std_dev))
        fenced.append(time.perf_counter() - t0)
    fenced_p50 = float(np.median(fenced))
    print(json.dumps({
        "metric": "polydet_dla34_2048x1024_wall_with_tunnel_rtt_p50",
        "value": fenced_p50,
        "unit": "s/frame",
        "vs_baseline": BASELINE_S / fenced_p50,
    }))

    # primary metric LAST (the driver parses the final JSON line)
    print(json.dumps({
        "metric": "polydet_dla34_2048x1024_device_time_per_frame",
        "value": device_s,
        "unit": "s/frame",
        "vs_baseline": BASELINE_S / device_s,
    }))


if __name__ == "__main__":
    main()
