#!/bin/bash
# Round-3 endgame chip queue: waits for the cycle-3 run (train_b0_r3c3.log)
# to finish, then runs, in order, with wall-clock guards so the driver's
# end-of-round bench still gets the chip:
#   1. renderer band A/B sweep (picks the bench default),
#   2. protocol eval of the cycle-3 best export,
#   3. --no_speed_limit protocol eval of the flagship (ablation row),
#   4. w/o-depth ablation train (12k) + protocol eval,
#   5. MLP-decoder ablation train (probe-only, whatever time remains).
set -u
cd /root/repo
LOG=train_b0_r3c3.log
PIDFILE=/tmp/train_r3c3.pid
END_TS=$(date -d "21:10" +%s)   # hard stop for starting long stages

for i in $(seq 1 720); do
  PID=$(cat "$PIDFILE" 2>/dev/null)
  if grep -q "^done:" "$LOG" 2>/dev/null; then
    if [ -z "$PID" ] || ! kill -0 "$PID" 2>/dev/null; then break; fi
  fi
  sleep 20
done
WPID=$(cat /tmp/wd_r3c3.pid 2>/dev/null)
[ -n "$WPID" ] && kill "$WPID" 2>/dev/null
sleep 10

export PYTHONPATH="/root/repo:/root/.axon_site"
echo "=== render band A/B sweep ==="
timeout 1500 python -u tools/bench_render_ab.py

echo "=== protocol eval: cycle-3 best ==="
timeout 1800 python -u -m e2e_parking_carla_tpu.cli.evaluate \
  --weights checkpoints/policy_b0_r3c3_best.msgpack.gz \
  --model_config_path config/training_b0.yaml \
  --eva_result_path eva_result_b0_r3c3

echo "=== protocol eval: flagship, no speed limit (ablation row) ==="
timeout 1800 python -u -m e2e_parking_carla_tpu.cli.evaluate \
  --weights checkpoints/policy_b0_r3_best.msgpack.gz \
  --model_config_path config/training_b0.yaml --no_speed_limit \
  --eva_result_path eva_result_b0_nospeed

if [ "$(date +%s)" -lt $((END_TS - 4200)) ]; then
  echo "=== ablation: w/o depth supervision (12k) ==="
  timeout 7200 python -u -m e2e_parking_carla_tpu.cli.train \
    --config config/training_b0_nodepth.yaml --steps 12000 --probe_every 1000 \
    --probe_export checkpoints/policy_b0_nodepth_best.msgpack.gz \
    > train_b0_nodepth.log 2>&1
  echo "=== protocol eval: w/o depth ==="
  timeout 1800 python -u -m e2e_parking_carla_tpu.cli.evaluate \
    --weights checkpoints/policy_b0_nodepth_best.msgpack.gz \
    --model_config_path config/training_b0_nodepth.yaml \
    --eva_result_path eva_result_b0_nodepth
else
  echo "skipping nodepth ablation: not enough wall clock"
fi

if [ "$(date +%s)" -lt $((END_TS - 2400)) ]; then
  echo "=== ablation: MLP decoder (probe-only, time-bounded) ==="
  LEFT=$(( END_TS - $(date +%s) - 300 ))
  timeout "$LEFT" python -u -m e2e_parking_carla_tpu.cli.train \
    --config config/training_b0_mlp.yaml --steps 12000 --probe_every 1000 \
    --probe_export checkpoints/policy_b0_mlp_best.msgpack.gz \
    > train_b0_mlp.log 2>&1
else
  echo "skipping mlp ablation: not enough wall clock"
fi
echo "=== endgame queue done ==="
