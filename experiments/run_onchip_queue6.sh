#!/bin/bash
# Round-5 follow-up queue: decompose the honest train-step time.
#
# Queue5 step 12b measured the rowband train step at 5.68 s/step (b8,
# focal+l1+iou+order, scan-differenced) and step 13 measured a single
# XLA DCN layer backward at 217 ms (b8) — so the full-model train cost
# could be dominated by EITHER the DCN backward or the exact polygon
# IoU loss gradient.  This queue separates the two:
#
#   20  duo train b8, l1-only poly loss (no IoU)  -> loss contribution
#   20b rowband train b8, l1-only                 -> same, Pallas bwd
#   21  smallhourglass train b8 (no DCN at all)   -> flagship train number
#   19  rowband isolated fwd/bwd at b8            -> kernel batch scaling
#
# Run AFTER queue5 (tpu_supervise6.sh waits on its completion marker).
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
MARKERS=${MARKERS:-/tmp/onchip_r5_done}
mkdir -p "$MARKERS"

alive() {
  flock -w 3600 /tmp/centerpoly_tpu.lock timeout 420 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); print('alive', float((x@x)[0,0]))"
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

run 20_train_duo_l1 3600 CENTERPOLY_DCN_FORMULATION=duo_tapwise python experiments/bench_train_iou.py --arch dla_34 --batch 8 --dtype bfloat16 --steps 8 --poly_loss l1
run 20b_train_rowband_l1 3600 CENTERPOLY_PALLAS_DCN=rowband:4 python experiments/bench_train_iou.py --arch dla_34 --batch 8 --dtype bfloat16 --steps 8 --poly_loss l1
run 21_train_hg 3600 python experiments/bench_train_iou.py --arch smallhourglass --batch 8 --dtype bfloat16 --steps 8
run 19_rowband_bwd_b8 3600 python experiments/bench_dcn_rowband.py --batch 8
# repeat of queue5 step 12b on a (hopefully) quiet chip: the original
# 5.68 s/step ran minutes after step 12 crashed the TPU worker, and the
# offline loss-cost probe (probe_loss_cost.py: IoU grad byte-floor
# ~3 ms) says the loss cannot account for it — degraded-chip artifact
# is a live hypothesis
run 12b2_train_rowband_repeat 3600 CENTERPOLY_PALLAS_DCN=rowband:4 python experiments/bench_train_iou.py --arch dla_34 --batch 8 --dtype bfloat16 --steps 8

echo "=== QUEUE6 COMPLETE ==="
