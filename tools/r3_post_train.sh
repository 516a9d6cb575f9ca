#!/bin/bash
# Round-3 post-training chip queue: waits for the warm-restart cycle to
# finish (its log gains a "done:" line and the PID exits), then with the
# chip free runs, in order:
#   1. the renderer elevation-band A/B sweep,
#   2. bench.py (headline number with the swept default),
#   3. the full 384-case protocol eval of the cycle-2 best checkpoint.
# PID-file based; never pattern-kills.
set -u
cd /root/repo
LOG=train_b0_r3c2.log
PIDFILE=/tmp/train_r3c2.pid

for i in $(seq 1 720); do
  PID=$(cat "$PIDFILE" 2>/dev/null)
  if grep -q "^done:" "$LOG" 2>/dev/null; then
    if [ -z "$PID" ] || ! kill -0 "$PID" 2>/dev/null; then break; fi
  fi
  sleep 20
done
# stop the training watchdog so it cannot relaunch into our chip window
WPID=$(cat /tmp/wd_r3c2.pid 2>/dev/null)
[ -n "$WPID" ] && kill "$WPID" 2>/dev/null
sleep 10

export PYTHONPATH="/root/repo:/root/.axon_site"
echo "=== render band A/B sweep ==="
timeout 1200 python -u tools/bench_render_ab.py
echo "=== bench.py ==="
timeout 900 python -u bench.py
echo "=== protocol eval: cycle-2 best ==="
timeout 1800 python -u -m e2e_parking_carla_tpu.cli.evaluate \
  --weights checkpoints/policy_b0_r3c2_best.msgpack.gz \
  --model_config_path config/training_b0.yaml \
  --eva_result_path eva_result_b0_r3c2
echo "=== queue done ==="
