#!/bin/bash
# Supervisor for the round-5 FINAL queue (run_onchip_queue7.sh).
#
#   nohup setsid bash experiments/tpu_supervise7.sh > /tmp/onchip_r5c.log 2>&1 &
#
# Registers in the watcher pidfile so `bash experiments/stop_watchers.sh`
# can end it (round-end hygiene: builders must not outlive the round).
cd "$(dirname "$0")/.."
echo $$ >> /tmp/centerpoly_watchers.pids
trap 'sed -i "/^$$\$/d" /tmp/centerpoly_watchers.pids 2>/dev/null' EXIT
MAX_ROUNDS=${MAX_ROUNDS:-12}
for round in $(seq 1 "$MAX_ROUNDS"); do
  echo "### supervisor7 round $round/$MAX_ROUNDS $(date -u)"
  bash experiments/tpu_watch.sh || continue
  if bash experiments/run_onchip_queue7.sh; then
    echo "### supervisor7: queue complete $(date -u)"
    exit 0
  fi
done
echo "### supervisor7: gave up after $MAX_ROUNDS rounds $(date -u)"
exit 1
