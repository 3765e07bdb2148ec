#!/bin/bash
# Supervisor for the round-5 queue (run_onchip_queue5.sh).
#
#   nohup setsid bash experiments/tpu_supervise5.sh > /tmp/onchip_r5.log 2>&1 &
#
# Registers in the watcher pidfile so `bash experiments/stop_watchers.sh`
# can end it (round-end hygiene: builders must not outlive the round).
cd "$(dirname "$0")/.."
echo $$ >> /tmp/centerpoly_watchers.pids
trap 'sed -i "/^$$\$/d" /tmp/centerpoly_watchers.pids 2>/dev/null' EXIT
MAX_ROUNDS=${MAX_ROUNDS:-12}
for round in $(seq 1 "$MAX_ROUNDS"); do
  echo "### supervisor5 round $round/$MAX_ROUNDS $(date -u)"
  bash experiments/tpu_watch.sh || continue
  if bash experiments/run_onchip_queue5.sh; then
    echo "### supervisor5: queue complete $(date -u)"
    exit 0
  fi
done
echo "### supervisor5: gave up after $MAX_ROUNDS rounds $(date -u)"
exit 1
