#!/bin/bash
# Block until the axon TPU tunnel answers a tiny jit, then exit 0.
# Chain with the measurement queue so a returning tunnel is never missed:
#
#   nohup setsid bash -c \
#     'bash experiments/tpu_watch.sh && bash experiments/run_onchip_queue.sh --quick && bash experiments/run_onchip_queue.sh' \
#     > /tmp/onchip_r4.log 2>&1 &
#
# Each probe is a bounded SUBPROCESS: on a dead tunnel `import jax`
# blocks forever inside C++ device discovery, so the probe must be
# killable from outside.  240 s cap: a healthy-but-cold tunnel
# measures ~116 s of device discovery (2026-08-19); 90 s misread it as dead.
cd "$(dirname "$0")/.."
while true; do
  if timeout 240 python -c "import jax, jax.numpy as jnp; x = jnp.ones((128, 128)); print('alive', float((x @ x)[0, 0]))"; then
    echo "tunnel up $(date -u)"
    exit 0
  fi
  echo "still down $(date -u)"
  sleep 120
done
