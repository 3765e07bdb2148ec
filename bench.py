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

METRIC HISTORY NOTE: round 1's primary metric (`device_pipeline_p50`,
vs_baseline=151.9 in BENCH_r01.json) was measured with the fake
block_until_ready fence above and was WITHDRAWN in round 2
(experiments/RESULTS.md "honest reset"); it is NOT comparable with the
scan-differenced `device_time_per_frame` reported from round 2 onward.
Do not read r01 -> r02 as a regression.

IMPORTANT perf note for this TPU stack: every device array the compiled
program needs is passed as a jit *argument* (variables, frame, transform,
mean, std).  Closing over a jnp array embeds it as an XLA constant, which
on this stack compiles pathologically and degrades every subsequent
dispatch in the process ~100x (0.5 ms -> 40 ms measured).

Prints ONE JSON line per metric {"metric", "value", "unit",
"vs_baseline"}; the PRIMARY metric is the LAST line.
vs_baseline > 1 means faster than the reference's 0.045 s.

If the TPU backend cannot be brought up (the axon tunnel drops and
device discovery then hangs forever — observed rounds 2-3), main()
probes it in a SUBPROCESS with a timeout, retries with backoff, and on
final failure prints a parseable {"metric", "error", ...} JSON line and
exits non-zero — it never hangs the driver.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_S = 0.045  # reference README.md:9,46 (RTX 2070)
PRIMARY_METRIC = "polydet_dla34_2048x1024_device_time_per_frame"

_PROBE_CODE = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((128, 128));"
    "print(float((x @ x)[0, 0]))"
)


def _backend_alive(timeout_s: float = 120.0) -> bool:
    """Probe the default JAX backend with a tiny jit in a SUBPROCESS.

    Device discovery on a dead axon tunnel blocks in C++ (uninterruptible
    from Python threads), so the probe must be a separate killable
    process.
    """
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE_CODE],
            timeout=timeout_s, capture_output=True)
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def ensure_backend(retries: int = 3, timeout_s: float = 120.0,
                   backoff_s: float = 30.0) -> "float | None":
    """Returns how long the successful probe took (s), or None if the
    backend never came up.  A slow success signals a flaky tunnel — the
    caller uses it to skip optional extras (auto-table priming) and go
    straight for the headline measurement."""
    t0 = time.time()   # TOTAL elapsed, incl. failed attempts + backoff:
    # a success after two 120 s hangs is still a flaky tunnel
    for attempt in range(retries):
        if _backend_alive(timeout_s):
            return time.time() - t0
        print(f"# backend probe {attempt + 1}/{retries} failed "
              f"(tiny-jit subprocess hung or errored)", file=sys.stderr)
        if attempt + 1 < retries:
            time.sleep(backoff_s)
    return None


def _prime_auto_table(timeout_s: float = 1500.0) -> None:
    """Self-priming DCN formulation selection.

    When the formulation is `auto` and the measured winner table
    (experiments/dcn_auto_table.json) has no entries for the b=1
    inference shapes, run a bounded FULL-MODEL A/B (uniform formulation
    across all DCN nodes — per-layer microbench mixing measured 63 ms
    vs uniform duo's 35 ms on-chip in round 4) in a subprocess to write
    them, so this bench's pipeline uses the measured winner even if the
    full experiment queue never ran on this chip.  Any failure or
    timeout falls through to the static heuristic (duo) — never fatal.
    """
    if os.environ.get(
            "CENTERPOLY_DCN_FORMULATION", "auto").lower() != "auto":
        return
    root = os.path.dirname(os.path.abspath(__file__))
    table_path = os.environ.get(
        "CENTERPOLY_DCN_AUTO_TABLE",
        os.path.join(root, "experiments", "dcn_auto_table.json"))
    try:
        with open(table_path) as f:
            table = json.load(f)
    except (OSError, ValueError):
        table = {}
    # the three DLA-34 @512x1024 inference node shape classes (b=1)
    keys = ["1,128,256,64,0", "1,64,128,128,0", "1,32,64,256,0"]
    if all(k in table for k in keys):
        return
    print("# auto table has no inference entries; priming with a "
          "full-model duo/quad/tapwise A/B (bounded)", file=sys.stderr)
    try:
        proc = subprocess.run(
            [sys.executable,
             os.path.join(root, "experiments", "profile_inference.py"),
             "--ab_forms", "duo,quad,tapwise", "--write_table"],
            timeout=timeout_s, capture_output=True, text=True)
        sys.stderr.write(proc.stdout + proc.stderr)
        if proc.returncode != 0:
            print("# shoot-out failed; using the static heuristic",
                  file=sys.stderr)
    except subprocess.TimeoutExpired:
        print("# shoot-out timed out; using the static heuristic",
              file=sys.stderr)


def main():
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    probe_s = ensure_backend()
    if probe_s is None:
        # final line is still a parseable JSON object for the driver
        print(json.dumps({
            "metric": PRIMARY_METRIC,
            "value": None,
            "unit": "s/frame",
            "vs_baseline": None,
            "error": "TPU backend failed to initialize: tiny-jit probe "
                     "subprocess hung/errored 3x over ~4 min (axon tunnel "
                     "down; device discovery blocks forever)",
        }))
        sys.exit(1)

    # self-priming is an optional extra: if even the tiny-jit probe took
    # >30 s the tunnel is flaky/cold and the ~15 min shoot-out could eat
    # the driver's whole bench window — spend it on the headline number
    if probe_s <= 30.0:
        _prime_auto_table(timeout_s=900.0)
    else:
        print(f"# backend probe took {probe_s:.0f}s; skipping auto-table "
              f"priming to protect the measurement budget", file=sys.stderr)

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

    # secondary: batched throughput — BASELINE.json's native metric is
    # "2048x1024 frames/sec/chip"; a production server feeds the chip a
    # same-shape frame stack through one compiled program
    # (Detector.run_batch / reference src/test.py:47-85 prefetch eval).
    # Honest device time via the same scan-differencing.
    B = 8
    frames = jax.device_put(
        (rng.rand(B, 1024, 2048, 3) * 255).astype(np.uint8))

    def scalar_batch(eps, variables, frames_u8, trans, mean, std):
        warped = jax.vmap(lambda f: warp_axis_aligned(
            f.astype(jnp.float32) + eps, trans,
            (cfg.input_h, cfg.input_w)))(frames_u8)
        x = (warped / 255.0 - mean) / std
        _, dets = det._process_device(variables, x)
        return jnp.sum(dets.astype(jnp.float32))

    batch_s = measure_device_time(
        scalar_batch, (det.variables, frames, trans_dev, mean_dev, std_dev))
    frames_per_s = B / batch_s
    print(json.dumps({
        "metric": f"polydet_dla34_2048x1024_batch{B}_frames_per_s_per_chip",
        "value": frames_per_s,
        "unit": "frames/s/chip",
        "vs_baseline": frames_per_s * BASELINE_S,
    }))

    # secondary: the PAPER config — smallhourglass (SURVEY §3.4; reference
    # large_hourglass.py:438-462), a pure-conv trunk with no DCN sampling.
    # Same semantic span (device-resident 2048x1024 frame -> detections).
    # Guarded: a failure here must never cost the primary metric.
    try:
        cfg_hg = Config(task="polydet", dataset="cityscapes",
                        arch="smallhourglass", input_h=512, input_w=1024)
        det_hg = PolydetDetector(cfg_hg)

        def scalar_hg(eps, variables, frame_u8, trans, mean, std):
            img = warp_axis_aligned(frame_u8.astype(jnp.float32) + eps,
                                    trans, (cfg_hg.input_h, cfg_hg.input_w))
            img = ((img / 255.0 - mean) / std)[None]
            _, dets = det_hg._process_device(variables, img)
            return jnp.sum(dets.astype(jnp.float32))

        hg_s = measure_device_time(
            scalar_hg,
            (det_hg.variables, frame, trans_dev, mean_dev, std_dev))
        print(json.dumps({
            "metric":
                "polydet_smallhourglass_2048x1024_device_time_per_frame",
            "value": hg_s,
            "unit": "s/frame",
            "vs_baseline": BASELINE_S / hg_s,
        }))
        del det_hg
    except Exception as e:  # pragma: no cover - defensive
        print(f"# smallhourglass secondary metric skipped: "
              f"{type(e).__name__}: {e}", file=sys.stderr)

    # secondary: the KITTI config (BASELINE.md rows 4-6: 0.045 s/frame
    # on ~1242x375 frames; our kitti_poly adapter warps to 512x1024 like
    # the reference's dataset default).  Same DLA-34 program as the
    # primary but a KITTI-shaped source frame, so it measures the warp +
    # net at the other aspect ratio.  Guarded like smallhourglass.
    try:
        kitti_frame = jax.device_put(
            (rng.rand(375, 1242, 3) * 255).astype(np.uint8))
        ktrans, _ = det.pre_process_meta(375, 1242, 1.0)
        ktrans_dev = jax.device_put(jnp.asarray(ktrans, jnp.float32))

        kitti_s = measure_device_time(
            scalar_pipeline,
            (det.variables, kitti_frame, ktrans_dev, mean_dev, std_dev))
        print(json.dumps({
            "metric": "polydet_dla34_kitti_1242x375_device_time_per_frame",
            "value": kitti_s,
            "unit": "s/frame",
            "vs_baseline": BASELINE_S / kitti_s,
        }))
    except Exception as e:  # pragma: no cover - defensive
        print(f"# kitti secondary metric skipped: "
              f"{type(e).__name__}: {e}", file=sys.stderr)

    # primary metric LAST (the driver parses the final JSON line)
    print(json.dumps({
        "metric": PRIMARY_METRIC,
        "value": device_s,
        "unit": "s/frame",
        "vs_baseline": BASELINE_S / device_s,
    }))


if __name__ == "__main__":
    main()
