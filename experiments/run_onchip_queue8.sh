#!/bin/bash
# Round-5 queue 8: re-measure training under the closed-form polygon-IoU
# loss (geometry/polygon.py Green's-segment rewrite).
#
# Queue6 (old scan+scatter loss) measured the IoU term at ~5.0-5.3 s/step
# b8 on BOTH archs; the first new-loss datapoint (queue7 step 22,
# duo_tapwise child launched after the rewrite landed) shows full
# focal+l1+iou+order at 1.1572 s/step == l1-only's 1.1566.  This queue
# captures the full after-table:
#
#   24  DLA-34 rowband:4, full loss   (expect ~0.37 s/step == l1-only)
#   25  smallhourglass, full loss     (expect ~backbone-bound)
#   26  fresh bench.py                (keeps last_onchip_bench.json warm)
#
# Idempotent via markers; safe to re-run after tunnel flaps.
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

# Chain: finish queue7 first (train auto-table A/B + bench) — its own
# markers make this a no-op when already complete.
bash experiments/run_onchip_queue7.sh || exit 1

run 24_train_rowband_newloss 3600 CENTERPOLY_PALLAS_DCN=rowband:4 python experiments/bench_train_iou.py \
  --arch dla_34 --batch 8 --dtype bfloat16 --steps 8

run 25_train_hg_newloss 3600 python experiments/bench_train_iou.py \
  --arch smallhourglass --batch 8 --dtype bfloat16 --steps 8

# The exact-semantics duo form OOM'd in the step-22 A/B under the OLD
# loss (a copy_select_fusion temp alloc); the closed-form loss removed
# those scatter fusions — retry it for the exact-path train row.
run 24b_train_duo_exact_newloss 3600 CENTERPOLY_DCN_FORMULATION=duo python experiments/bench_train_iou.py \
  --arch dla_34 --batch 8 --dtype bfloat16 --steps 8

# fresh bench capture (bench.py takes the chip lock itself - do NOT
# wrap it in flock or it deadlocks against its own acquire loop).
if [ ! -e "$MARKERS/26_bench" ]; then
  echo "=== step 26_bench ==="
  if timeout 3600 python bench.py; then touch "$MARKERS/26_bench"; else
    echo "=== step 26_bench FAILED - will retry on next queue run ==="
  fi
fi

echo "=== QUEUE8 COMPLETE ==="
