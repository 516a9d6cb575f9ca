#!/bin/bash
# Round-3 flagship: DART (noise-injected expert) b0 run. Waits for the
# previous TPU holder to exit, launches the run, then attaches the stall
# watchdog (tools/r3_watchdog.sh). PID-file based; never pattern-kills.
set -u
PREV_PID_FILE="${1:-/tmp/train_b0_r3.pid}"
LOG=/root/repo/train_b0_dart.log
PIDFILE=/tmp/train_dart.pid
ARGS=(--config config/training_b0.yaml --steps 45000
      --probe_every 1000
      --probe_export checkpoints/policy_b0_dart_best.msgpack.gz
      --image_log_dir artifacts/trainlog_b0_dart
      --dagger_frac 0.0
      --dart_steer 0.25 --dart_accel 0.15)

# wait (max 40 min) for the previous run to release the TPU
for i in $(seq 1 240); do
  PID=$(cat "$PREV_PID_FILE" 2>/dev/null)
  if [ -z "$PID" ] || ! kill -0 "$PID" 2>/dev/null; then break; fi
  sleep 10
done
# and for its watchdog to stop relaunching it
for i in $(seq 1 60); do
  WPID=$(cat /tmp/wd.pid 2>/dev/null)
  if [ -z "$WPID" ] || ! kill -0 "$WPID" 2>/dev/null; then break; fi
  sleep 5
done
sleep 5

cd /root/repo
PYTHONPATH="/root/repo:/root/.axon_site" nohup python -u -m \
  e2e_parking_carla_tpu.cli.train "${ARGS[@]}" > "$LOG" 2>&1 &
echo $! > "$PIDFILE"
echo "launched pid $(cat $PIDFILE)"

# recover the experiment dir from the log header for --resume relaunches
for i in $(seq 1 120); do
  EXP=$(grep -m1 "^checkpoints -> " "$LOG" 2>/dev/null | sed 's/^checkpoints -> //')
  [ -n "$EXP" ] && break
  sleep 5
done
echo "exp dir: $EXP"
nohup bash tools/r3_watchdog.sh "$LOG" "$PIDFILE" "$EXP" "${ARGS[@]}" \
  > /dev/null 2>&1 &
echo $! > /tmp/wd_dart.pid
echo "watchdog pid $(cat /tmp/wd_dart.pid)"
