#!/bin/bash
# Supervisor for run_onchip_queue8.sh (new-loss train re-measurement).
#
#   nohup setsid bash experiments/tpu_supervise8.sh > /tmp/onchip_r5d.log 2>&1 &
#
# Waits for queue7 to finish first (its 23_bench marker) so the two
# supervisors never interleave chip work, then runs queue8 to completion.
# Registers in the watcher pidfile so `bash experiments/stop_watchers.sh`
# can end it (round-end hygiene: builders must not outlive the round).
cd "$(dirname "$0")/.."
echo $$ >> /tmp/centerpoly_watchers.pids
trap 'sed -i "/^$$\$/d" /tmp/centerpoly_watchers.pids 2>/dev/null' EXIT
MARKERS=${MARKERS:-/tmp/onchip_r5_done}

# Wait (up to ~2h) for queue7 to finish its bench step.  This is only
# politeness — /tmp/centerpoly_tpu.lock serializes all chip work anyway —
# so after the cap we proceed regardless and let flock arbitrate.
for i in $(seq 1 120); do
  [ -e "$MARKERS/23_bench" ] && break
  sleep 60
done

MAX_ROUNDS=${MAX_ROUNDS:-12}
for round in $(seq 1 "$MAX_ROUNDS"); do
  echo "### supervisor8 round $round/$MAX_ROUNDS $(date -u)"
  bash experiments/tpu_watch.sh || continue
  if bash experiments/run_onchip_queue8.sh; then
    echo "### supervisor8: queue complete $(date -u)"
    exit 0
  fi
done
echo "### supervisor8: gave up after $MAX_ROUNDS rounds $(date -u)"
exit 1
