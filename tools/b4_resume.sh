#!/bin/bash
# Resume the 75k-step b4 parity run after a deadline kill or across rounds.
# Extracts the orbax exp dir from the run log and relaunches with --resume
# (which takes the checkpoint DIR as its argument — cli/train.py:33) plus
# the same recipe args, under the stall watchdog. Optional DEADLINE_EPOCH
# bounds the run exactly like tools/r4_remainder.sh stage_b4.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

LOG=train_b4_r4.log
PIDFILE=/tmp/train_b4_r4.pid
EXP=$(grep -m1 "^checkpoints -> " "$LOG" | sed 's/^checkpoints -> //')
[ -n "$EXP" ] || { echo "no exp dir in $LOG"; exit 1; }
grep -q "^done:" "$LOG" && { echo "run already complete"; exit 0; }

ARGS=(--config config/training.yaml --steps 75000
      --probe_every 2000
      --probe_export checkpoints/policy_b4_r4_best.msgpack.gz
      --image_log_dir artifacts/trainlog_b4_r4
      --dagger_timeout_keep 4 --near_frac 0.5 --dagger_late_boost 2.0
      --mirror_aug)

rm -rf "$EXP"/*.orbax-checkpoint-tmp 2>/dev/null
nohup python -u -m e2e_parking_carla_tpu.cli.train \
  --resume "$EXP" "${ARGS[@]}" >> "$LOG" 2>&1 &
echo $! > "$PIDFILE"
echo "resumed pid $(cat $PIDFILE) from $EXP"
nohup bash tools/r3_watchdog.sh "$LOG" "$PIDFILE" "$EXP" "${ARGS[@]}" \
  > /dev/null 2>&1 &
echo $! > /tmp/wd_b4_r4.pid
echo "watchdog pid $(cat /tmp/wd_b4_r4.pid)"

if [ -n "${DEADLINE_EPOCH:-}" ]; then
  while [ "$(date +%s)" -lt "$DEADLINE_EPOCH" ]; do
    grep -q "^done:" "$LOG" 2>/dev/null && break
    sleep 60
  done
  kill "$(cat /tmp/wd_b4_r4.pid)" 2>/dev/null
  kill "$(cat "$PIDFILE")" 2>/dev/null
  sleep 10
  kill -9 "$(cat "$PIDFILE")" 2>/dev/null
  echo "released chip at $(date +%T)"
fi
