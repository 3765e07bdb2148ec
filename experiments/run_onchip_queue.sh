#!/bin/bash
# One-shot on-chip measurement queue (round 4). Run from the repo root
# the moment the TPU tunnel is back:
#
#   bash experiments/run_onchip_queue.sh 2>&1 | tee /tmp/onchip_r4.log
#
# `--quick` runs only steps 0/1/2/9 (~45 min of caps) so a short tunnel
# window still produces the headline device-time number; rerun without
# the flag when the window is long.
#
# Step 1's per-shape shoot-out writes the RESEARCH table
# (dcn_shape_table.json) only; the production auto table
# (dcn_auto_table.json) is written exclusively by the full-model A/B
# (profile_inference.py --write_table). Every step is individually
# bounded so one hung run can't eat the session, and `alive` re-probes
# the tunnel between steps so a mid-run tunnel death aborts the queue
# in <2 min (exit 1) instead of burning every remaining step's cap —
# the supervisor loop (experiments/tpu_supervise.sh) then goes back to
# watching and restarts the queue when the tunnel returns.
set -x
QUICK=0
[ "$1" = "--quick" ] && QUICK=1
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

alive() {
  flock -w 3600 /tmp/centerpoly_tpu.lock timeout 240 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); print('alive', float((x@x)[0,0]))"
}
gate() {  # abort the queue fast when the tunnel died mid-run
  alive || { echo "=== TUNNEL LOST - aborting queue ==="; exit 1; }
}

echo "=== 0. tunnel sanity ==="
alive || exit 1

echo "=== 1. DCN formulation shoot-out (research table only) ==="
if [ "$QUICK" = "0" ]; then
  flock -w 3600 /tmp/centerpoly_tpu.lock timeout 1800 python experiments/bench_dcn_variants.py --batch 1 --dtype bfloat16 --write_table
  gate
else
  echo "skipped in --quick mode (per-shape winners are research data)"
fi

echo "=== 2. full-pipeline A/B: tapwise vs quad vs duo vs auto(table) ==="
for form in tapwise quad duo fused; do
  echo "--- formulation=$form"
  CENTERPOLY_DCN_FORMULATION=$form timeout 1800 python experiments/profile_inference.py
  gate
done
echo "--- formulation=auto (measured table)"
flock -w 3600 /tmp/centerpoly_tpu.lock timeout 1800 python experiments/profile_inference.py
gate

if [ "$QUICK" = "1" ]; then
  echo "=== 9. the driver bench (quick mode) ==="
  flock -w 3600 /tmp/centerpoly_tpu.lock timeout 1800 python bench.py
  echo "=== QUICK QUEUE COMPLETE (rerun without --quick for steps 3-8) ==="
  exit 0
fi

echo "=== 3. rowband Pallas kernel: compile + numerics + timing ==="
flock -w 3600 /tmp/centerpoly_tpu.lock timeout 2400 python experiments/bench_dcn_rowband.py --r 4
gate

echo "=== 4. batch-8 variants (training-scale fwd shapes) ==="
flock -w 3600 /tmp/centerpoly_tpu.lock timeout 1800 python experiments/bench_dcn_variants.py --batch 8 --dtype bfloat16
gate

echo "=== 5. DCN backward: quad_tapwise vs tapwise ==="
flock -w 3600 /tmp/centerpoly_tpu.lock timeout 2400 python experiments/bench_dcn_bwd.py --batch 8 --dtype bfloat16
gate

echo "=== 6. paper-scale training step: dla_34 b8 bf16 quad_tapwise ==="
CENTERPOLY_DCN_FORMULATION=quad_tapwise flock -w 3600 /tmp/centerpoly_tpu.lock timeout 3000 python experiments/bench_train_iou.py --arch dla_34 --batch 8 --dtype bfloat16 --steps 5
gate
echo "--- baseline tapwise for comparison"
CENTERPOLY_DCN_FORMULATION=tapwise flock -w 3600 /tmp/centerpoly_tpu.lock timeout 3000 python experiments/bench_train_iou.py --arch dla_34 --batch 8 --dtype bfloat16 --steps 5
gate

echo "=== 6b. training step under the best stem layout (A/B vs 6) ==="
CENTERPOLY_DCN_FORMULATION=quad_tapwise CENTERPOLY_STEM_LAYOUT=nchw flock -w 3600 /tmp/centerpoly_tpu.lock timeout 3000 python experiments/bench_train_iou.py --arch dla_34 --batch 8 --dtype bfloat16 --steps 5
gate

echo "=== 7. batched throughput ==="
flock -w 3600 /tmp/centerpoly_tpu.lock timeout 1800 python experiments/bench_batch.py
gate

echo "=== 5b. train-time auto table (fwd+bwd timing via --train) ==="
flock -w 3600 /tmp/centerpoly_tpu.lock timeout 2400 python experiments/bench_dcn_variants.py --batch 8 --dtype bfloat16 --write_table --train
gate

echo "=== 8. stem layout + gather-rate probes (512B rows decide the quad byte-ceiling question) ==="
flock -w 3600 /tmp/centerpoly_tpu.lock timeout 1200 python experiments/probe_stem_layout.py
flock -w 3600 /tmp/centerpoly_tpu.lock timeout 1200 python experiments/probe_gather_rates.py
gate

echo "=== 8a. full-model stem-layout A/B (dlav0 isolates the non-DCN share) ==="
for layout in nchw im2col; do
  echo "--- CENTERPOLY_STEM_LAYOUT=$layout"
  CENTERPOLY_STEM_LAYOUT=$layout timeout 1800 python experiments/profile_inference.py
  gate
done

echo "=== 8c. paper-config (smallhourglass) full-pipeline profile ==="
flock -w 3600 /tmp/centerpoly_tpu.lock timeout 1800 python experiments/profile_inference.py --archs smallhourglass
gate

echo "=== 8b. Mosaic compile-surface re-bisect (toolchain may have moved) ==="
flock -w 3600 /tmp/centerpoly_tpu.lock timeout 1200 python experiments/probe_mosaic_gather.py

echo "=== 9. the driver bench ==="
flock -w 3600 /tmp/centerpoly_tpu.lock timeout 1800 python bench.py

echo "=== QUEUE COMPLETE ==="
