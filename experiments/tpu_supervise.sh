#!/bin/bash
# Supervisor for the on-chip measurement queue on a flaky tunnel.
#
#   nohup setsid bash experiments/tpu_supervise.sh > /tmp/onchip_r4.log 2>&1 &
#
# Loop: block until the tunnel answers (tpu_watch.sh), run the --quick
# queue (headline number first), then the full queue.  If either aborts
# because the tunnel died mid-run (run_onchip_queue.sh's `gate` exits 1),
# go back to watching and retry when it returns — the compile cache makes
# retries cheap.  Stops after the full queue completes or MAX_ROUNDS
# tunnel windows have been tried.
cd "$(dirname "$0")/.."
# register for stop_watchers.sh (round-end hygiene: supervisors must not
# outlive the round; pid-addressed shutdown, never pattern-killed)
echo $$ >> /tmp/centerpoly_watchers.pids
trap 'sed -i "/^$$\$/d" /tmp/centerpoly_watchers.pids 2>/dev/null' EXIT
MAX_ROUNDS=${MAX_ROUNDS:-12}
QUICK_DONE=0
for round in $(seq 1 "$MAX_ROUNDS"); do
  echo "### supervisor round $round/$MAX_ROUNDS $(date -u)"
  bash experiments/tpu_watch.sh || continue
  if [ "$QUICK_DONE" = "0" ]; then
    if bash experiments/run_onchip_queue.sh --quick; then
      QUICK_DONE=1
    else
      continue   # tunnel died during quick: watch again
    fi
  fi
  if bash experiments/run_onchip_queue.sh; then
    echo "### supervisor: full queue complete $(date -u)"
    exit 0
  fi
done
echo "### supervisor: gave up after $MAX_ROUNDS rounds $(date -u)"
exit 1
