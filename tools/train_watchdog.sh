#!/bin/bash
# Training watchdog: failure detection + elastic restart (the reference has
# no infra-level recovery, SURVEY §5; checkpoints + --resume make restarts
# lossless here).
#
# Usage: tools/train_watchdog.sh <log_file> <ckpt_dir> <train args...>
# Restarts the trainer with --resume when the log goes quiet for >5 min.

LOG="$1"; CKPT="$2"; shift 2
STALL_SECS=300

while true; do
  sleep 120
  if ! pgrep -f "cli.train" > /dev/null; then
    if grep -q "^done:" "$LOG" 2>/dev/null; then
      echo "[watchdog] training finished" >> "$LOG.watchdog"
      exit 0
    fi
    echo "[watchdog] $(date +%T) trainer dead; restarting" >> "$LOG.watchdog"
  else
    age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$age" -lt "$STALL_SECS" ]; then
      continue
    fi
    echo "[watchdog] $(date +%T) stalled ${age}s; killing" >> "$LOG.watchdog"
    pkill -9 -f "cli.train" 2>/dev/null
  fi
  # wait for the TPU claim to free up
  for i in $(seq 1 12); do
    sleep 45
    if timeout 40 python -c "import jax, jax.numpy as j; j.ones(3).sum().block_until_ready()" 2>/dev/null; then
      break
    fi
  done
  echo "[watchdog] $(date +%T) relaunching with --resume $CKPT" >> "$LOG.watchdog"
  nohup python -u -m e2e_parking_carla_tpu.cli.train "$@" --resume "$CKPT" >> "$LOG" 2>&1 &
done
