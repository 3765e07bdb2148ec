#!/bin/bash
# Resumable on-chip queue, round 4 v3 — reruns invalidated by the
# dispatch-loop timing bug (probe_timer_calibration.py measured the
# block_until_ready methodology at 335x chip peak: it times dispatch,
# not execution).  bench_train_iou.py and bench_dcn_bwd.py now use the
# scan-differenced device timer; every step below re-measures a number
# whose prior value is invalid or was measured before the rowband win.
#
#   bash experiments/run_onchip_queue3.sh 2>&1 | tee -a /tmp/onchip_r4d.log
#
# Ordered by value: honest train step (duo_tapwise, then rowband's
# fused Pallas backward), per-grad bwd microbench, rowband batched
# throughput, then the refreshed bench.py (new rowband secondary).
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
MARKERS=${MARKERS:-/tmp/onchip_r4d_done}
mkdir -p "$MARKERS"

alive() {
  flock -w 3600 /tmp/centerpoly_tpu.lock timeout 240 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); print('alive', float((x@x)[0,0]))"
}
gate() {
  alive || { echo "=== TUNNEL LOST - aborting queue (markers kept) ==="; exit 1; }
}
# run <marker> <timeout_s> <cmd...>: skip if done, mark done on rc=0
run() {
  local marker="$1" cap="$2"; shift 2
  if [ -e "$MARKERS/$marker" ]; then echo "=== skip $marker (done) ==="; return 0; fi
  echo "=== step $marker ==="
  if flock -w 3600 /tmp/centerpoly_tpu.lock timeout "$cap" env "$@"; then touch "$MARKERS/$marker"; else
    echo "=== step $marker FAILED (rc=$?) - will retry on next queue run ==="
  fi
  gate
}

echo "=== 0. tunnel sanity ==="
alive || exit 1

# 12. honest paper-scale train step (scan-differenced; the 16:45
# dispatch-loop value 0.0058 s "MFU 3.1" is invalid).  The true value
# is bounded by [dispatch floor, 0.0218 s transfer-serialized upper
# bound from the 13:20 runs].
run 12_train_duo 3600 CENTERPOLY_DCN_FORMULATION=duo_tapwise python experiments/bench_train_iou.py --arch dla_34 --batch 8 --dtype bfloat16 --steps 8

# 12b. rowband fused-Pallas-backward train step, same contract
run 12b_train_rowband 3600 CENTERPOLY_PALLAS_DCN=rowband:4 python experiments/bench_train_iou.py --arch dla_34 --batch 8 --dtype bfloat16 --steps 8

# 13. per-grad DCN backward decomposition (prior 0.03 ms rows invalid)
run 13_bwd 3600 python experiments/bench_dcn_bwd.py --batch 8 --dtype bfloat16

# 14. batched DLA-34 throughput with rowband (bench_batch is DLA-34
# 2048x1024 source frames; duo measured 36.3 f/s/chip on the auto-mix,
# rowband's 2.08x forward win should move it)
run 14_batch_rowband 2400 CENTERPOLY_PALLAS_DCN=rowband:4 python experiments/bench_batch.py

# 9b. refreshed bench.py: picks up the new dla34-rowband secondary
run 9b_bench 2400 python bench.py

# 15. AP-parity evidence for the rowband y-band: train the dla_34
# rectangle fixture END-TO-END with every DCN node on the rowband
# kernel (fused Pallas bwd in the real train loop) and score
# non-oracle decode->rasterize->AP.  Exact-path reference from
# RESULTS.md: AP50 0.879 @ 40 steps.
run 15_rowband_convergence 3600 CENTERPOLY_PALLAS_DCN=rowband:4 python experiments/train_convergence.py --arch dla_34 --rep cartesian --poly_loss l1

echo "=== QUEUE3 COMPLETE ==="
