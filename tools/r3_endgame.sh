#!/bin/bash
# Round-3 endgame chip queue: waits for the cycle-3 run (train_b0_r3c3.log)
# to finish, then runs, in priority order with wall-clock guards so the
# driver's end-of-round bench still gets the chip:
#   1. renderer band A/B sweep (picks the bench default),
#   2. protocol eval of the cycle-3 best export (flagship candidate),
#   3. w/o-depth ablation train — time-bounded; its probes at matched steps
#      against the flagship run's logged probes are the ordering evidence,
#   4. protocol eval of the w/o-depth best export (if time),
#   5. --no_speed_limit protocol eval of the flagship (ablation row).
set -u
cd /root/repo
LOG=train_b0_r3c3.log
PIDFILE=/tmp/train_r3c3.pid
HARD_END=$(date -d "21:05" +%s)

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

# ---- w/o-depth ablation: bounded by the wall clock, probes carry the
# ordering signal even if the run is cut short ----
LEFT=$(( HARD_END - $(date +%s) - 1500 ))   # reserve eval + no-speed slots
if [ "$LEFT" -gt 900 ]; then
  echo "=== ablation: w/o depth supervision (time-bounded ${LEFT}s) ==="
  timeout "$LEFT" python -u -m e2e_parking_carla_tpu.cli.train \
    --config config/training_b0_nodepth.yaml --steps 12000 --probe_every 1000 \
    --probe_export checkpoints/policy_b0_nodepth_best.msgpack.gz \
    > train_b0_nodepth.log 2>&1
  echo "nodepth train rc=$? (143 = time-bounded cut, probes still logged)"
else
  echo "skipping nodepth ablation: not enough wall clock"
fi

if [ -f checkpoints/policy_b0_nodepth_best.msgpack.gz ] && \
   [ $(( HARD_END - $(date +%s) )) -gt 700 ]; then
  echo "=== protocol eval: w/o depth ==="
  timeout 1500 python -u -m e2e_parking_carla_tpu.cli.evaluate \
    --weights checkpoints/policy_b0_nodepth_best.msgpack.gz \
    --model_config_path config/training_b0_nodepth.yaml \
    --eva_result_path eva_result_b0_nodepth
fi

if [ $(( HARD_END - $(date +%s) )) -gt 600 ]; then
  echo "=== protocol eval: flagship, no speed limit (ablation row) ==="
  timeout 1500 python -u -m e2e_parking_carla_tpu.cli.evaluate \
    --weights checkpoints/policy_b0_r3_best.msgpack.gz \
    --model_config_path config/training_b0.yaml --no_speed_limit \
    --eva_result_path eva_result_b0_nospeed
fi
echo "=== endgame queue done ==="
