#!/bin/bash
# Round-3 stall watchdog: PID-file based (never pattern-kills). If the
# training log goes quiet for >8 min (the axon tunnel occasionally hangs a
# dispatch forever), kill the saved PID and relaunch with --resume.
# Usage: tools/r3_watchdog.sh <log> <pidfile> <resume_dir> <train args...>
LOG="$1"; PIDFILE="$2"; RESUME="$3"; shift 3
# Must exceed the worst-case silent window: a --resume relaunch logs
# nothing while it restores + compiles (~10 min measured when the compile
# cache is cold). 480s here killed healthy relaunches mid-compile.
STALL=900

while true; do
  sleep 60
  PID=$(cat "$PIDFILE" 2>/dev/null)
  if [ -z "$PID" ] || ! kill -0 "$PID" 2>/dev/null; then
    if grep -q "^done:" "$LOG" 2>/dev/null; then
      echo "[wd] $(date +%T) finished" >> "$LOG.wd"; exit 0
    fi
    echo "[wd] $(date +%T) dead; resuming" >> "$LOG.wd"
  else
    age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    [ "$age" -lt "$STALL" ] && continue
    echo "[wd] $(date +%T) stalled ${age}s; killing $PID" >> "$LOG.wd"
    kill "$PID" 2>/dev/null; sleep 10
    kill -9 "$PID" 2>/dev/null; sleep 5
  fi
  # drop incomplete orbax tmp dirs so restore sees only finished steps
  rm -rf "$RESUME"/*.orbax-checkpoint-tmp 2>/dev/null
  sleep 20
  PYTHONPATH="/root/repo:/root/.axon_site" nohup python -u -m \
    e2e_parking_carla_tpu.cli.train --resume "$RESUME" "$@" >> "$LOG" 2>&1 &
  echo $! > "$PIDFILE"
  echo "[wd] $(date +%T) relaunched pid $(cat $PIDFILE)" >> "$LOG.wd"
  sleep 900   # give the restart time to restore + compile before re-checking
done
