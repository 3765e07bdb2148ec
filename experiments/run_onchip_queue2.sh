#!/bin/bash
# Resumable on-chip measurement queue (round 4, v2).  Unlike
# run_onchip_queue.sh (which restarts at step 1 after every tunnel
# drop — it died 4x mid-run on 2026-08-19 and re-measured steps 1-2
# five times), this queue records a marker per COMPLETED step under
# $MARKERS and skips completed steps on restart, so a flaky tunnel
# eventually finishes the whole list.
#
#   bash experiments/run_onchip_queue2.sh 2>&1 | tee -a /tmp/onchip_r4b.log
#
# Steps 1-2 of v1 are already measured (5 repeats each in
# /tmp/onchip_r4.log); this queue starts from the still-unmeasured
# work, ordered by value: auto-table validation, rowband Mosaic,
# training step, batch throughput, stem probes, microbenches, bench.
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
MARKERS=${MARKERS:-/tmp/onchip_r4_done}
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

# 2v. validate that auto (model-level table -> duo) now matches pure duo
run 2v_auto_validate 1800 python experiments/profile_inference.py --archs dla_34

# 3. rowband Pallas kernel: first-ever real-Mosaic compile + numerics + timing
run 3_rowband 2400 python experiments/bench_dcn_rowband.py --r 4

# 10. rowband FULL-MODEL A/B (uniform kernel for every supported DCN node:
# per-layer mixing is falsified, see models/deform_conv.py _auto_table).
# 10b: same uniform selection in the paper-scale train step — rowband's
# fused Pallas backward has never run fwd+bwd at model scale.
run 10_rowband_model 2400 CENTERPOLY_PALLAS_DCN=rowband:4 python experiments/profile_inference.py --archs dla_34
run 10b_rowband_train 3000 CENTERPOLY_PALLAS_DCN=rowband:4 python experiments/bench_train_iou.py --arch dla_34 --batch 8 --dtype bfloat16 --steps 5

# 11. clean duo_tapwise re-measure: the 12:53 run compiled through a
# congested tunnel (830 s vs ~190 s neighbors) and its 0.0753 s/step is
# 3x its quad_tapwise/tapwise siblings — re-measure with a warm cache
run 11_train_duo_tapwise_rerun 3000 CENTERPOLY_DCN_FORMULATION=duo_tapwise python experiments/bench_train_iou.py --arch dla_34 --batch 8 --dtype bfloat16 --steps 5

# 6. paper-scale training step A/B (b8 bf16, 5 steps each)
run 6_train_duo_tapwise 3000 CENTERPOLY_DCN_FORMULATION=duo_tapwise python experiments/bench_train_iou.py --arch dla_34 --batch 8 --dtype bfloat16 --steps 5
run 6_train_quad_tapwise 3000 CENTERPOLY_DCN_FORMULATION=quad_tapwise python experiments/bench_train_iou.py --arch dla_34 --batch 8 --dtype bfloat16 --steps 5
run 6_train_tapwise 3000 CENTERPOLY_DCN_FORMULATION=tapwise python experiments/bench_train_iou.py --arch dla_34 --batch 8 --dtype bfloat16 --steps 5
run 6b_train_stem_nchw 3000 CENTERPOLY_DCN_FORMULATION=duo_tapwise CENTERPOLY_STEM_LAYOUT=nchw python experiments/bench_train_iou.py --arch dla_34 --batch 8 --dtype bfloat16 --steps 5

# 7. batched inference throughput (auto now resolves to duo)
run 7_batch 1800 python experiments/bench_batch.py

# 8c. paper-config (smallhourglass) full-pipeline component profile
run 8c_smallhourglass 1800 python experiments/profile_inference.py --archs smallhourglass

# 8/8a. stem layout + gather-rate probes; full-model stem A/B
run 8_stem_probe 1200 python experiments/probe_stem_layout.py
run 8_gather_rates 1200 python experiments/probe_gather_rates.py
run 8a_stem_nchw 1800 CENTERPOLY_STEM_LAYOUT=nchw python experiments/profile_inference.py
run 8a_stem_im2col 1800 CENTERPOLY_STEM_LAYOUT=im2col python experiments/profile_inference.py

# 4/5. per-shape microbenches (research data, no table writes)
run 4_variants_b8 1800 python experiments/bench_dcn_variants.py --batch 8 --dtype bfloat16
run 5_bwd 2400 python experiments/bench_dcn_bwd.py --batch 8 --dtype bfloat16

# 8b. Mosaic compile-surface re-bisect
run 8b_mosaic 1200 python experiments/probe_mosaic_gather.py

# 9. the driver bench (auto -> duo via the committed model-level table)
run 9_bench 1800 python bench.py

echo "=== QUEUE2 COMPLETE ==="
