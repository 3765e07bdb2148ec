#!/bin/bash
# Supervisor for the round-5 follow-up queue (run_onchip_queue6.sh).
# Waits for queue5 to finish (its final 9c_bench marker, or its
# supervisor exiting) so the two queues don't interleave at lock
# granularity, then runs queue6 to completion.
#
#   nohup setsid bash experiments/tpu_supervise6.sh > /tmp/onchip_r5b.log 2>&1 &
cd "$(dirname "$0")/.."
echo $$ >> /tmp/centerpoly_watchers.pids
trap 'sed -i "/^$$\$/d" /tmp/centerpoly_watchers.pids 2>/dev/null' EXIT
# queue5's supervisor pid is the first line of the watchers pidfile
# (it registered there at launch); wait for its completion marker or
# its death, whichever comes first.
Q5PID=${Q5PID:-$(head -1 /tmp/centerpoly_watchers.pids 2>/dev/null)}
while [ ! -e /tmp/onchip_r5_done/9c_bench ]; do
  if [ -z "$Q5PID" ] || ! kill -0 "$Q5PID" 2>/dev/null; then
    echo "### supervisor6: queue5 supervisor gone, proceeding $(date -u)"
    break
  fi
  sleep 120
done
MAX_ROUNDS=${MAX_ROUNDS:-8}
for round in $(seq 1 "$MAX_ROUNDS"); do
  echo "### supervisor6 round $round/$MAX_ROUNDS $(date -u)"
  bash experiments/tpu_watch.sh || continue
  if bash experiments/run_onchip_queue6.sh; then
    echo "### supervisor6: queue complete $(date -u)"
    exit 0
  fi
done
echo "### supervisor6: gave up after $MAX_ROUNDS rounds $(date -u)"
exit 1
