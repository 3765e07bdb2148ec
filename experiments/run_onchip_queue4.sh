#!/bin/bash
# Resumable on-chip queue, round 4 v4 — batch-size sweeps.  The b=1
# smallhourglass latency is at the memory roofline (RESULTS.md), so
# throughput now comes from batch; this finds the throughput-optimal
# batch for the paper config and for DLA-34 under the rowband kernel.
#
#   bash experiments/run_onchip_queue4.sh 2>&1 | tee -a /tmp/onchip_r4e.log
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
MARKERS=${MARKERS:-/tmp/onchip_r4e_done}
mkdir -p "$MARKERS"

alive() {
  flock -w 3600 /tmp/centerpoly_tpu.lock timeout 240 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); print('alive', float((x@x)[0,0]))"
}
gate() {
  alive || { echo "=== TUNNEL LOST - aborting queue (markers kept) ==="; exit 1; }
}
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

# 16. paper-config batch sweep (the sweep itself stops on OOM)
run 16_sweep_hg 3000 python experiments/bench_batch_sweep.py --arch smallhourglass --batches 1,2,4,8,16,32

# 16b. DLA-34 rowband batch sweep
run 16b_sweep_dla_rowband 3000 CENTERPOLY_PALLAS_DCN=rowband:4 python experiments/bench_batch_sweep.py --arch dla_34 --batches 1,2,4,8

echo "=== QUEUE4 COMPLETE ==="
