#!/bin/bash
# Round-5 FINAL queue: everything still owed to the round, in priority order.
#
#   A. run_onchip_queue6.sh  - the honest train-step decomposition
#      (duo/rowband l1-only, smallhourglass train, rowband b8 kernel,
#      quiet-chip repeat of the 5.68 s row)
#   B. 22_train_ab_table     - train-mode FULL-MODEL A/B across the XLA
#      formulations, writing the winner into the production auto table's
#      train keys (VERDICT item 7: ",1" rows, measured not heuristic)
#   C. 23_bench              - fresh bench.py so last_onchip_bench.json
#      (the stale-evidence record) is as close to round end as possible.
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

# A. the train-step decomposition queue (its own markers make this cheap
# if it already ran)
bash experiments/run_onchip_queue6.sh || exit 1

# B. train-mode auto-table rows: full-model A/B (round-4 lesson: never
# per-shape isolated winners), winner written to the ",1" keys.
run 22_train_ab_table 7200 python experiments/bench_train_iou.py \
  --arch dla_34 --batch 8 --dtype bfloat16 --steps 6 \
  --ab_forms duo,duo_tapwise,quad_tapwise,fused --write_table

# C. fresh bench capture (bench.py takes the chip lock itself - do NOT
# wrap it in flock or it deadlocks against its own NB acquire loop).
if [ ! -e "$MARKERS/23_bench" ]; then
  echo "=== step 23_bench ==="
  if timeout 3600 python bench.py; then touch "$MARKERS/23_bench"; else
    echo "=== step 23_bench FAILED - will retry on next queue run ==="
  fi
fi

echo "=== QUEUE7 COMPLETE ==="
