#!/bin/bash
# Supervisor for the RESUMABLE on-chip queue v3 (run_onchip_queue3.sh).
#
#   nohup setsid bash experiments/tpu_supervise3.sh > /tmp/onchip_r4d.log 2>&1 &
#
# Loop: block until the tunnel answers (tpu_watch.sh), run queue3 —
# which skips every step already marked done — until it completes.
cd "$(dirname "$0")/.."
# register for stop_watchers.sh (round-end hygiene: supervisors must not
# outlive the round; pid-addressed shutdown, never pattern-killed)
echo $$ >> /tmp/centerpoly_watchers.pids
trap 'sed -i "/^$$\$/d" /tmp/centerpoly_watchers.pids 2>/dev/null' EXIT
MAX_ROUNDS=${MAX_ROUNDS:-12}
for round in $(seq 1 "$MAX_ROUNDS"); do
  echo "### supervisor3 round $round/$MAX_ROUNDS $(date -u)"
  bash experiments/tpu_watch.sh || continue
  if bash experiments/run_onchip_queue3.sh; then
    echo "### supervisor3: queue complete $(date -u)"
    exit 0
  fi
done
echo "### supervisor3: gave up after $MAX_ROUNDS rounds $(date -u)"
exit 1
