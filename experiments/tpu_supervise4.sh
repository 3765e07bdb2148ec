#!/bin/bash
# Supervisor for queue v4 (batch sweeps).  Chained launch pattern so it
# never contends with queue v3 for the chip (contention falsified a
# round-4 measurement once already — RESULTS.md absolute-time caveat):
#
#   nohup setsid bash -c 'while kill -0 $(cat /tmp/supervise3.pid) 2>/dev/null; \
#     do sleep 60; done; bash experiments/tpu_supervise4.sh' \
#     > /tmp/onchip_r4e.log 2>&1 &
cd "$(dirname "$0")/.."
# register for stop_watchers.sh (round-end hygiene: supervisors must not
# outlive the round; pid-addressed shutdown, never pattern-killed)
echo $$ >> /tmp/centerpoly_watchers.pids
trap 'sed -i "/^$$\$/d" /tmp/centerpoly_watchers.pids 2>/dev/null' EXIT
MAX_ROUNDS=${MAX_ROUNDS:-12}
for round in $(seq 1 "$MAX_ROUNDS"); do
  echo "### supervisor4 round $round/$MAX_ROUNDS $(date -u)"
  bash experiments/tpu_watch.sh || continue
  if bash experiments/run_onchip_queue4.sh; then
    echo "### supervisor4: queue complete $(date -u)"
    exit 0
  fi
done
echo "### supervisor4: gave up after $MAX_ROUNDS rounds $(date -u)"
exit 1
