#!/bin/bash
# Round-4 b4 parity run (VERDICT-2 item 3): the paper's backbone at the
# sample budget the from-scratch trunk actually needs (~3x the b0 run;
# r2's 25k-step b4 was still improving when it stopped). Uses the same
# recipe that produced the b0 flagship plus the round-3 recovery levers.
# ~7 h on one v5e at the measured 158 ms/step-class throughput.
set -u
cd /root/repo
LOG=train_b4_r4.log
PIDFILE=/tmp/train_b4_r4.pid
ARGS=(--config config/training.yaml --steps 75000
      --probe_every 2000
      --probe_export checkpoints/policy_b4_r4_best.msgpack.gz
      --image_log_dir artifacts/trainlog_b4_r4
      --dagger_timeout_keep 4 --near_frac 0.5 --mirror_aug)

export PYTHONPATH="/root/repo:/root/.axon_site"
nohup python -u -m e2e_parking_carla_tpu.cli.train "${ARGS[@]}" \
  > "$LOG" 2>&1 &
echo $! > "$PIDFILE"
echo "launched pid $(cat $PIDFILE)"

for i in $(seq 1 120); do
  EXP=$(grep -m1 "^checkpoints -> " "$LOG" 2>/dev/null | sed 's/^checkpoints -> //')
  [ -n "$EXP" ] && break
  sleep 5
done
echo "exp dir: $EXP"
nohup bash tools/r3_watchdog.sh "$LOG" "$PIDFILE" "$EXP" "${ARGS[@]}" \
  > /dev/null 2>&1 &
echo $! > /tmp/wd_b4_r4.pid
echo "watchdog pid $(cat /tmp/wd_b4_r4.pid)"
