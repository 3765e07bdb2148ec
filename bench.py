"""Benchmark: polydet on-device latency per 2048x1024 frame.

Measures the same semantic span as the reference's published runtime
(README.md:46: 0.045 s/frame on an RTX 2070, read off the detector stage
timers base_detector.py:105-191 — image array in memory -> detections):
here the whole span runs on one TPU chip as a single compiled program:

    uint8 2048x1024 frame (device-resident) -> affine warp + normalize
    -> backbone forward (bf16) -> sigmoid/peak-NMS/top-K polygon decode
    -> (K, 6+2N+1) detections

PRIMARY METRIC = the PAPER CONFIG: `smallhourglass` (1-stack hourglass).
Every experiment the reference publishes — cityscapes, polar, KITTI,
IDD (reference experiments/*.sh, all `--arch smallhourglass`) — and
therefore the published 0.045 s runtime AND the published AP rows are
that architecture.  Comparing a DLA-34 runtime against a number
published for smallhourglass (rounds 2-3 of this repo) was
apples-to-oranges; DLA-34 remains a secondary metric below.

TIMING SEMANTICS (measured on this axon harness 2026-08-17): device I/O
is tunneled over a network; `block_until_ready` acknowledges DISPATCH,
not execution, and any dispatch+fetch round trip pays a ~40 ms RTT.
Neither wall-clock fencing nor fence-once pipelining measures the chip.
The number reported here is the true on-device execution time, obtained
by running the frame pipeline k times inside one compiled program with a
data-dependent carry (so XLA can neither elide nor overlap iterations),
fetching one scalar, and differencing k=1 vs k=17 so RTT and dispatch
overhead cancel (centerpoly_tpu/utils/timing.py).

METRIC HISTORY (cross-round comparability):
- r01 `device_pipeline_p50` (vs_baseline=151.9) used a fake
  block_until_ready fence and was WITHDRAWN in round 2.
- r02-r03 primary `polydet_dla34_2048x1024_device_time_per_frame`
  (honest scan-differenced DLA-34; best measured 35.1 ms with the duo
  DCN formulation).
- r04+ primary `polydet_smallhourglass_2048x1024_device_time_per_frame`
  (honest scan-differenced; the same-architecture comparison with the
  published 0.045 s).  The r03->r04 vs_baseline jump is this metric
  redefinition plus the model-level DCN selection fix, not a silent
  speedup claim; both numbers are printed every run.

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

BASELINE_S = 0.045  # reference README.md:9,46 (RTX 2070, smallhourglass)
PRIMARY_METRIC = "polydet_smallhourglass_2048x1024_device_time_per_frame"

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


def ensure_backend(retries: int = 3, timeout_s: float = None,
                   backoff_s: float = 30.0) -> "float | None":
    """Returns how long the successful probe took (s), or None if the
    backend never came up.  A slow success signals a flaky tunnel — the
    caller uses it to skip optional extras (auto-table priming) and go
    straight for the headline measurement."""
    if timeout_s is None:
        # measured 2026-08-19 (round 5): a healthy-but-cold tunnel takes
        # ~116 s of device discovery, so the old 120 s probe cap
        # misclassified it as dead; 2026-08-20 (fresh VM + cold tunnel):
        # two 240 s probes failed before the third succeeded at 554 s
        # total — the cold path can exceed 240 s, so default higher still
        timeout_s = float(os.environ.get("CENTERPOLY_PROBE_TIMEOUT", "420"))
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
    them, so the DLA-34 secondary metric uses the measured winner even
    if the full experiment queue never ran on this chip.  Any failure
    or timeout falls through to the static heuristic (duo) — never
    fatal.
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
    # the four DLA-34 @512x1024 inference node shape classes (b=1)
    keys = ["1,128,256,64,0", "1,64,128,128,0", "1,32,64,256,0",
            "1,16,32,512,0"]
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
            print("# A/B failed; using the static heuristic (duo)",
                  file=sys.stderr)
    except subprocess.TimeoutExpired:
        print("# A/B timed out; using the static heuristic (duo)",
              file=sys.stderr)


_LAST_RECORD_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "experiments", "last_onchip_bench.json")


def _persist_record(rec: dict) -> None:
    """Persist each successful on-chip primary measurement so a later
    tunnel-down capture still carries evidence (3 rounds recorded only
    `value: null` because the tunnel happened to be dead at the
    driver's capture moment)."""
    try:
        rec = dict(rec)
        rec["measured_at"] = time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        with open(_LAST_RECORD_PATH, "w") as f:
            json.dump(rec, f)
    except OSError:
        pass


def _emit_stale_record() -> None:
    """On backend failure, surface the most recent persisted on-chip
    measurement as a clearly-marked stale secondary (NOT the final
    line — the final line stays the honest error record)."""
    try:
        with open(_LAST_RECORD_PATH) as f:
            rec = json.load(f)
    except (OSError, ValueError):
        return
    rec["stale"] = True
    rec["note"] = ("most recent successful on-chip measurement; the "
                   "tunnel was down at THIS capture time")
    print(json.dumps(rec))


def main():
    """Supervisor: never imports jax itself.

    The backend probe can succeed and the tunnel die one second later
    (observed 2026-08-19); device work in THIS process would then hang
    uninterruptibly in C++ and the driver would record a timeout
    instead of a parseable result.  So the measurement runs in a child
    process (_CENTERPOLY_BENCH_CHILD=1 re-exec of this file) under a
    hard deadline; whatever metric lines the child managed to flush are
    relayed, and on child timeout/crash the parent still ends with a
    parseable error JSON line and exit 1.
    """
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    # chip lock: serialize with queue steps / other bench runs — a
    # contended chip produced a falsified measurement in round 4 and
    # starved the round-5 probes.  Bounded wait, then proceed anyway
    # (a measurement under contention beats none).
    import fcntl
    lock = open(os.environ.get("CENTERPOLY_LOCK_FILE",
                               "/tmp/centerpoly_tpu.lock"), "w")
    lock_deadline = time.time() + float(
        os.environ.get("CENTERPOLY_LOCK_WAIT", "1800"))
    while True:
        try:
            fcntl.flock(lock, fcntl.LOCK_EX | fcntl.LOCK_NB)
            break
        except OSError:
            if time.time() > lock_deadline:
                print("# chip lock still held after wait; proceeding "
                      "under contention", file=sys.stderr)
                break
            time.sleep(10)

    probe_s = ensure_backend()
    if probe_s is None:
        _emit_stale_record()
        # final line is still a parseable JSON object for the driver
        print(json.dumps({
            "metric": PRIMARY_METRIC,
            "value": None,
            "unit": "s/frame",
            "vs_baseline": None,
            "error": "TPU backend failed to initialize: tiny-jit probe "
                     "subprocess hung/errored 3x (axon tunnel "
                     "down; device discovery blocks forever)",
        }))
        sys.exit(1)

    deadline_s = float(os.environ.get("CENTERPOLY_BENCH_TIMEOUT", "1500"))
    env = os.environ.copy()
    env["_CENTERPOLY_BENCH_CHILD"] = "1"
    env["_CENTERPOLY_BENCH_PROBE_S"] = f"{probe_s:.1f}"
    env["PYTHONUNBUFFERED"] = "1"
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)], env=env,
        stdout=subprocess.PIPE, stderr=None)  # stderr inherits

    # Relay child lines LIVE under the deadline.  (communicate(timeout)
    # + kill + communicate() LOSES the pre-timeout output — measured on
    # this CPython — so a hang after the primary line would otherwise
    # discard the already-measured headline.)  Raw os.read on the fd,
    # not readline(): a buffered reader can hold lines that select()
    # will never report readable again.
    import selectors
    sel = selectors.DefaultSelector()
    sel.register(proc.stdout, selectors.EVENT_READ)
    deadline = time.time() + deadline_s
    primary = None
    timed_out = False
    pending = b""

    def _handle(raw_line: bytes):
        nonlocal primary
        line = raw_line.decode("utf-8", "replace")
        sys.stdout.write(line + "\n")
        sys.stdout.flush()
        try:
            rec = json.loads(line)
        except ValueError:
            return
        if (rec.get("metric") == PRIMARY_METRIC
                and rec.get("value") is not None):
            primary = line

    eof = False
    while not eof:
        budget = deadline - time.time()
        if budget <= 0:
            timed_out = True
            proc.kill()
            break
        if sel.select(timeout=min(budget, 5.0)):
            chunk = os.read(proc.stdout.fileno(), 65536)
            if not chunk:         # EOF: child finished (or died)
                eof = True
            else:
                pending += chunk
            while b"\n" in pending:
                raw, pending = pending.split(b"\n", 1)
                _handle(raw)
    if pending.strip():           # unterminated final line
        _handle(pending)
    sel.close()
    rc = proc.wait() if not timed_out else None

    if not timed_out and rc == 0:
        if primary is None:       # child exited clean but never emitted it
            print(json.dumps({
                "metric": PRIMARY_METRIC, "value": None, "unit": "s/frame",
                "vs_baseline": None,
                "error": "bench child exited 0 without a primary metric "
                         "line"}))
            sys.exit(1)
        return                    # output already ends with the primary
    if primary is not None:
        # the child measured + flushed the headline before dying or
        # hitting the deadline: promote it to the final line — a real
        # number beats an error record
        why = (f"hit the {deadline_s:.0f}s deadline"
               if timed_out else f"exited rc={rc}")
        print(f"# bench child {why} after the primary was measured; "
              f"remaining secondaries were cut", file=sys.stderr)
        print(primary)
        return
    _emit_stale_record()
    print(json.dumps({
        "metric": PRIMARY_METRIC, "value": None, "unit": "s/frame",
        "vs_baseline": None,
        "error": (f"bench child hit the {deadline_s:.0f}s deadline "
                  if timed_out else f"bench child exited rc={rc} ")
                 + f"(tunnel likely died mid-measurement; probe was "
                   f"{probe_s:.1f}s)"}))
    sys.exit(1)


def _measure():
    probe_s = float(os.environ.get("_CENTERPOLY_BENCH_PROBE_S", "0"))

    import jax
    import jax.numpy as jnp

    from centerpoly_tpu.configs import Config
    from centerpoly_tpu.geometry.affine import warp_axis_aligned
    from centerpoly_tpu.infer.detector import PolydetDetector
    from centerpoly_tpu.utils.timing import measure_device_time

    rng = np.random.RandomState(0)
    frame = jax.device_put((rng.rand(1024, 2048, 3) * 255).astype(np.uint8))

    def emit(metric, value, unit, vs):
        print(json.dumps({"metric": metric, "value": value, "unit": unit,
                          "vs_baseline": vs}), flush=True)

    # ---- PRIMARY: the paper config (smallhourglass), measured FIRST so
    # a flaky tunnel window is spent on the headline, printed LAST (the
    # driver parses the final JSON line)
    cfg_hg = Config(task="polydet", dataset="cityscapes",
                    arch="smallhourglass", input_h=512, input_w=1024)
    det_hg = PolydetDetector(cfg_hg)
    trans, _ = det_hg.pre_process_meta(1024, 2048, 1.0)
    trans_dev = jax.device_put(jnp.asarray(trans, dtype=jnp.float32))
    mean_dev = jax.device_put(jnp.asarray(cfg_hg.mean, jnp.float32))
    std_dev = jax.device_put(jnp.asarray(cfg_hg.std, jnp.float32))

    def scalar_hg(eps, variables, frame_u8, trans, mean, std):
        img = warp_axis_aligned(frame_u8.astype(jnp.float32) + eps,
                                trans, (cfg_hg.input_h, cfg_hg.input_w))
        img = ((img / 255.0 - mean) / std)[None]
        _, dets = det_hg._process_device(variables, img)
        return jnp.sum(dets.astype(jnp.float32))

    hg_s = measure_device_time(
        scalar_hg, (det_hg.variables, frame, trans_dev, mean_dev, std_dev))
    # checkpoint the headline NOW (it is re-printed as the final line
    # below; the supervisor parent promotes this early copy to the
    # final line if a later secondary hangs past the deadline), and
    # persist it for the tunnel-down stale-evidence path
    emit(PRIMARY_METRIC, hg_s, "s/frame", BASELINE_S / hg_s)
    _persist_record({"metric": PRIMARY_METRIC, "value": hg_s,
                     "unit": "s/frame",
                     "vs_baseline": BASELINE_S / hg_s})

    # secondary: wall latency incl. the tunnel round trip (dispatch +
    # execute + fetch detections) — what a REMOTE client of this chip
    # sees; a co-located host pays device time plus PCIe-scale copies
    try:
        def pipeline_hg(variables, frame_u8, trans, mean, std):
            img = warp_axis_aligned(frame_u8.astype(jnp.float32), trans,
                                    (cfg_hg.input_h, cfg_hg.input_w))
            img = ((img / 255.0 - mean) / std)[None]
            _, dets = det_hg._process_device(variables, img)
            return dets

        fn = jax.jit(pipeline_hg)
        np.asarray(fn(det_hg.variables, frame, trans_dev, mean_dev, std_dev))
        fenced = []
        for _ in range(10):
            t0 = time.perf_counter()
            np.asarray(fn(det_hg.variables, frame, trans_dev, mean_dev,
                          std_dev))
            fenced.append(time.perf_counter() - t0)
        fenced_p50 = float(np.median(fenced))
        emit("polydet_smallhourglass_2048x1024_wall_with_tunnel_rtt_p50",
             fenced_p50, "s/frame", BASELINE_S / fenced_p50)
    except Exception as e:  # pragma: no cover - defensive
        print(f"# wall-rtt secondary skipped: {type(e).__name__}: {e}",
              file=sys.stderr)

    # secondary: batched throughput on the paper config — BASELINE.json's
    # native metric is "2048x1024 frames/sec/chip"; a production server
    # feeds the chip a same-shape frame stack through one compiled
    # program (Detector.run_batch / reference src/test.py:47-85).
    # B=32 is the measured throughput-optimal batch (on-chip sweep
    # 2026-08-20, bench_batch_sweep.py: 233.1 f/s at b32 vs 216.9 at
    # b8 vs 194.9 at b1 — RESULTS.md round-5 sweep table).
    try:
        B = 32
        frames = jax.device_put(
            (rng.rand(B, 1024, 2048, 3) * 255).astype(np.uint8))

        def scalar_hg_batch(eps, variables, frames_u8, trans, mean, std):
            warped = jax.vmap(lambda f: warp_axis_aligned(
                f.astype(jnp.float32) + eps, trans,
                (cfg_hg.input_h, cfg_hg.input_w)))(frames_u8)
            x = (warped / 255.0 - mean) / std
            _, dets = det_hg._process_device(variables, x)
            return jnp.sum(dets.astype(jnp.float32))

        batch_s = measure_device_time(
            scalar_hg_batch,
            (det_hg.variables, frames, trans_dev, mean_dev, std_dev))
        fps = B / batch_s
        emit(f"polydet_smallhourglass_2048x1024_batch{B}"
             f"_frames_per_s_per_chip", fps, "frames/s/chip",
             fps * BASELINE_S)
    except Exception as e:  # pragma: no cover - defensive
        print(f"# smallhourglass batch secondary skipped: "
              f"{type(e).__name__}: {e}", file=sys.stderr)

    # secondary: KITTI-shaped source frame (README.md:47 row: 0.045 s,
    # same smallhourglass arch; our kitti_poly adapter warps ~1242x375
    # to the 512x1024 input like the reference's dataset default)
    try:
        kitti_frame = jax.device_put(
            (rng.rand(375, 1242, 3) * 255).astype(np.uint8))
        ktrans, _ = det_hg.pre_process_meta(375, 1242, 1.0)
        ktrans_dev = jax.device_put(jnp.asarray(ktrans, jnp.float32))
        kitti_s = measure_device_time(
            scalar_hg,
            (det_hg.variables, kitti_frame, ktrans_dev, mean_dev, std_dev))
        emit("polydet_smallhourglass_kitti_1242x375_device_time_per_frame",
             kitti_s, "s/frame", BASELINE_S / kitti_s)
    except Exception as e:  # pragma: no cover - defensive
        print(f"# kitti secondary skipped: {type(e).__name__}: {e}",
              file=sys.stderr)

    del det_hg

    # ---- secondary: DLA-34 (the r02-r03 primary; CenterNet's flagship
    # arch, 18 DCNv2 nodes).  `auto` resolves the DCN formulation via
    # the measured model-level table (duo); prime it if absent and the
    # tunnel looks healthy.
    try:
        if probe_s <= 30.0:
            _prime_auto_table(timeout_s=900.0)
        else:
            print(f"# backend probe took {probe_s:.0f}s; skipping "
                  f"auto-table priming to protect the measurement budget",
                  file=sys.stderr)

        cfg = Config(task="polydet", dataset="cityscapes", arch="dla_34",
                     input_h=512, input_w=1024)
        det = PolydetDetector(cfg)

        def scalar_dla(eps, variables, frame_u8, trans, mean, std):
            img = warp_axis_aligned(frame_u8.astype(jnp.float32) + eps,
                                    trans, (cfg.input_h, cfg.input_w))
            img = ((img / 255.0 - mean) / std)[None]
            _, dets = det._process_device(variables, img)
            return jnp.sum(dets.astype(jnp.float32))

        dla_s = measure_device_time(
            scalar_dla, (det.variables, frame, trans_dev, mean_dev, std_dev))
        emit("polydet_dla34_2048x1024_device_time_per_frame",
             dla_s, "s/frame", BASELINE_S / dla_s)

        B = 8
        frames = jax.device_put(
            (rng.rand(B, 1024, 2048, 3) * 255).astype(np.uint8))

        def scalar_dla_batch(eps, variables, frames_u8, trans, mean, std):
            warped = jax.vmap(lambda f: warp_axis_aligned(
                f.astype(jnp.float32) + eps, trans,
                (cfg.input_h, cfg.input_w)))(frames_u8)
            x = (warped / 255.0 - mean) / std
            _, dets = det._process_device(variables, x)
            return jnp.sum(dets.astype(jnp.float32))

        batch_s = measure_device_time(
            scalar_dla_batch,
            (det.variables, frames, trans_dev, mean_dev, std_dev))
        fps = B / batch_s
        emit(f"polydet_dla34_2048x1024_batch{B}_frames_per_s_per_chip",
             fps, "frames/s/chip", fps * BASELINE_S)
    except Exception as e:  # pragma: no cover - defensive
        print(f"# dla34 secondary metrics skipped: "
              f"{type(e).__name__}: {e}", file=sys.stderr)

    # ---- secondary: DLA-34 with the rowband Pallas DCN kernel (every
    # DCN node on the MXU one-hot-matmul path, y-offsets banded to ±4).
    # Opt-in semantics deviation from exact DCNv2, reported separately;
    # measured 2026-08-19: 16.9 ms forward vs 35.1 ms for the best XLA
    # formulation (RESULTS.md).  The env var is read at trace time, so
    # a FRESH detector must be built under it.
    prev_env = os.environ.get("CENTERPOLY_PALLAS_DCN")
    try:
        os.environ["CENTERPOLY_PALLAS_DCN"] = "rowband:4"
        cfg_rb = Config(task="polydet", dataset="cityscapes",
                        arch="dla_34", input_h=512, input_w=1024)
        det_rb = PolydetDetector(cfg_rb)

        def scalar_rb(eps, variables, frame_u8, trans, mean, std):
            img = warp_axis_aligned(frame_u8.astype(jnp.float32) + eps,
                                    trans, (cfg_rb.input_h, cfg_rb.input_w))
            img = ((img / 255.0 - mean) / std)[None]
            _, dets = det_rb._process_device(variables, img)
            return jnp.sum(dets.astype(jnp.float32))

        rb_s = measure_device_time(
            scalar_rb, (det_rb.variables, frame, trans_dev, mean_dev,
                        std_dev))
        emit("polydet_dla34_rowband_2048x1024_device_time_per_frame",
             rb_s, "s/frame", BASELINE_S / rb_s)

        # rowband batched throughput at the measured sweep winner
        # (on-chip 2026-08-20, bench_batch_sweep.py: b4 77.4 f/s vs
        # b1 59.4 / b8 62.3 — RESULTS.md round-5 sweep table)
        B = 4
        frames_rb = jax.device_put(
            (rng.rand(B, 1024, 2048, 3) * 255).astype(np.uint8))

        def scalar_rb_batch(eps, variables, frames_u8, trans, mean, std):
            warped = jax.vmap(lambda f: warp_axis_aligned(
                f.astype(jnp.float32) + eps, trans,
                (cfg_rb.input_h, cfg_rb.input_w)))(frames_u8)
            x = (warped / 255.0 - mean) / std
            _, dets = det_rb._process_device(variables, x)
            return jnp.sum(dets.astype(jnp.float32))

        batch_s = measure_device_time(
            scalar_rb_batch,
            (det_rb.variables, frames_rb, trans_dev, mean_dev, std_dev))
        fps = B / batch_s
        emit(f"polydet_dla34_rowband_2048x1024_batch{B}"
             f"_frames_per_s_per_chip", fps, "frames/s/chip",
             fps * BASELINE_S)
    except Exception as e:  # pragma: no cover - defensive
        print(f"# dla34 rowband secondary skipped: "
              f"{type(e).__name__}: {e}", file=sys.stderr)
    finally:
        if prev_env is None:
            os.environ.pop("CENTERPOLY_PALLAS_DCN", None)
        else:
            os.environ["CENTERPOLY_PALLAS_DCN"] = prev_env

    # ---- secondary: training throughput.  DLA-34 b8 512x1024 bf16 under
    # the rowband fused-Pallas backward with the FULL loss
    # (focal+l1+iou+order polar) — the closed-form polygon-IoU loss runs
    # at its bandwidth floor (RESULTS.md round 5), so this is the honest
    # production train-step contract.  Identical program to
    # `bench_train_iou.py --arch dla_34 --batch 8 --dtype bfloat16` under
    # rowband:4, so the persistent compile cache is warm after any queue
    # run.  No published reference train-step baseline exists;
    # vs_baseline is omitted.
    prev_env = os.environ.get("CENTERPOLY_PALLAS_DCN")
    try:
        os.environ["CENTERPOLY_PALLAS_DCN"] = "rowband:4"
        import importlib.util as _ilu
        _spec = _ilu.spec_from_file_location(
            "bench_train_iou", os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "experiments", "bench_train_iou.py"))
        _bti = _ilu.module_from_spec(_spec)
        _spec.loader.exec_module(_bti)
        rec = _bti.measure_train_step(
            arch="dla_34", batch=8, h=512, w=1024,
            poly_loss="l1+iou", rep="polar", dtype="bfloat16", steps=8)
        emit("polydet_dla34_rowband_train_b8_512x1024_step_time",
             rec["step_s"], "s/step", None)
        emit("polydet_dla34_rowband_train_b8_512x1024_frames_per_s_per_chip",
             rec["frames_per_s"], "frames/s/chip", None)
    except Exception as e:  # pragma: no cover - defensive
        print(f"# train secondary skipped: {type(e).__name__}: {e}",
              file=sys.stderr)
    finally:
        if prev_env is None:
            os.environ.pop("CENTERPOLY_PALLAS_DCN", None)
        else:
            os.environ["CENTERPOLY_PALLAS_DCN"] = prev_env

    # primary metric LAST (the driver parses the final JSON line)
    emit(PRIMARY_METRIC, hg_s, "s/frame", BASELINE_S / hg_s)


if __name__ == "__main__":
    if os.environ.get("_CENTERPOLY_BENCH_CHILD"):
        _measure()
    else:
        main()
