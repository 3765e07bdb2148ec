#!/bin/bash
# Supervisor for the RESUMABLE on-chip queue (run_onchip_queue2.sh).
#
#   nohup setsid bash experiments/tpu_supervise2.sh > /tmp/onchip_r4b.log 2>&1 &
#
# Loop: block until the tunnel answers (tpu_watch.sh), run queue2 —
# which skips every step already marked done — until it completes.
# Unlike tpu_supervise.sh, a mid-run tunnel death costs only the step
# that was interrupted, not the whole queue.
cd "$(dirname "$0")/.."
# register for stop_watchers.sh (round-end hygiene: supervisors must not
# outlive the round; pid-addressed shutdown, never pattern-killed)
echo $$ >> /tmp/centerpoly_watchers.pids
trap 'sed -i "/^$$\$/d" /tmp/centerpoly_watchers.pids 2>/dev/null' EXIT
MAX_ROUNDS=${MAX_ROUNDS:-12}
for round in $(seq 1 "$MAX_ROUNDS"); do
  echo "### supervisor2 round $round/$MAX_ROUNDS $(date -u)"
  bash experiments/tpu_watch.sh || continue
  if bash experiments/run_onchip_queue2.sh; then
    echo "### supervisor2: queue complete $(date -u)"
    exit 0
  fi
done
echo "### supervisor2: gave up after $MAX_ROUNDS rounds $(date -u)"
exit 1
