#!/bin/bash
# Resumable on-chip queue, round 5 — the VERDICT r4 harvest list.
#
#   bash experiments/run_onchip_queue5.sh 2>&1 | tee -a /tmp/onchip_r5.log
#
# Ordered by value:
#   1. honest (scan-differenced) train-step numbers incl. the rowband
#      fused-Pallas-backward step (VERDICT item 3),
#   2. rowband y-clamp AP parity BOTH directions + learned-offset
#      saturation stats (item 4),
#   3. batch-size sweeps for the throughput-optimal batch (item 5),
#   4. train-mode auto-table rows via a FULL-MODEL train A/B (item 7 —
#      per-shape isolated winners mix badly, measured round 4),
#   5. rowband R=6/8 cost (weak 6 hedge), final bench refresh.
#
# Every chip-touching step takes /tmp/centerpoly_tpu.lock (bench.py
# takes the same lock), caps its wall, and re-probes the tunnel after.
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
MARKERS=${MARKERS:-/tmp/onchip_r5_done}
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

# -- 1. honest train-step device time (scan-differenced) ---------------
run 12_train_duo 3600 CENTERPOLY_DCN_FORMULATION=duo_tapwise python experiments/bench_train_iou.py --arch dla_34 --batch 8 --dtype bfloat16 --steps 8
run 12b_train_rowband 3600 CENTERPOLY_PALLAS_DCN=rowband:4 python experiments/bench_train_iou.py --arch dla_34 --batch 8 --dtype bfloat16 --steps 8
run 13_bwd 3600 python experiments/bench_dcn_bwd.py --batch 8 --dtype bfloat16

# -- 2. rowband AP parity (both directions) + offset saturation --------
# 15a: train STANDARD -> eval rowband:4 on the same weights, plus
# learned-|offset| percentiles / clamp saturation at R=4
run 15a_parity_std_train 5400 python experiments/train_convergence.py --arch dla_34 --rep cartesian --poly_loss l1 --eval_dcn rowband:4 --offset_stats 4
# 15b: train WITH rowband end-to-end (fused Pallas backward in the real
# train loop), non-oracle AP vs the exact-path reference (0.879 @ 40)
run 15b_parity_rowband_train 5400 CENTERPOLY_PALLAS_DCN=rowband:4 python experiments/train_convergence.py --arch dla_34 --rep cartesian --poly_loss l1

# -- 3. batch sweeps ----------------------------------------------------
run 16_sweep_hg 3000 python experiments/bench_batch_sweep.py --arch smallhourglass --batches 1,2,4,8,16,32
run 16b_sweep_dla_rowband 3000 CENTERPOLY_PALLAS_DCN=rowband:4 python experiments/bench_batch_sweep.py --arch dla_34 --batches 1,2,4,8
run 14_batch_rowband 2400 CENTERPOLY_PALLAS_DCN=rowband:4 python experiments/bench_batch.py

# -- 4. train-mode auto-table rows (FULL-MODEL train A/B) ---------------
run 17_train_table 7200 python experiments/bench_train_iou.py --arch dla_34 --batch 8 --dtype bfloat16 --steps 8 --ab_forms duo_tapwise,tapwise,quad_tapwise,duo --write_table

# -- 5. rowband R=6/8 inference cost (lossless-R hedge) -----------------
run 18_rowband_r6 2400 CENTERPOLY_PALLAS_DCN=rowband:6 python experiments/profile_inference.py --archs dla_34
run 18b_rowband_r8 2400 CENTERPOLY_PALLAS_DCN=rowband:8 python experiments/profile_inference.py --archs dla_34

# -- final: refresh the persisted bench evidence ------------------------
run 9c_bench 2400 python bench.py

echo "=== QUEUE5 COMPLETE ==="
