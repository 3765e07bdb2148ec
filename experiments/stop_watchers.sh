#!/bin/bash
# Round-end hygiene: stop every registered builder supervisor/queue by
# PIDFILE — never by command-line pattern (a pattern can match the
# session's own process and end the round).  Supervisors register in
# /tmp/centerpoly_watchers.pids (see tpu_supervise*.sh) and deregister
# on exit; this kills whatever is still alive, process group included
# when the pid is a group leader (the documented setsid launch).
#
#   bash experiments/stop_watchers.sh
PIDS_FILE=/tmp/centerpoly_watchers.pids
[ -f "$PIDS_FILE" ] || { echo "no watchers registered"; exit 0; }
while read -r pid; do
  [ -n "$pid" ] || continue
  if kill -0 "$pid" 2>/dev/null; then
    pgid=$(ps -o pgid= -p "$pid" | tr -d ' ')
    if [ "$pgid" = "$pid" ]; then
      echo "stopping supervisor group pid=pgid=$pid"
      kill -TERM -- "-$pgid" 2>/dev/null
    else
      # not a group leader (launched without setsid): kill the pid and
      # its direct children by PARENT pid (pkill -P is pid-addressed,
      # not pattern-addressed)
      echo "stopping supervisor pid=$pid (+children)"
      pkill -TERM -P "$pid" 2>/dev/null
      kill -TERM "$pid" 2>/dev/null
    fi
  fi
done < "$PIDS_FILE"
rm -f "$PIDS_FILE"
echo "watchers stopped"
