#!/bin/bash
# Round-4 revival queue: poll for the TPU tunnel, then run the remaining
# round-4 chip work in priority order. Safe to re-run; every stage skips
# itself if its artifact exists. Stages:
#   1. resume the b4 warm-start run (orbax state in ./ckpt_b4_r4b) to 20k,
#      bounded by DEADLINE_EPOCH (default: +100 min from chip return)
#   2. protocol-eval the b4 probe-best (plain + mirror ensemble)
#   3. hardware floor-attribution sweep for the render kernel
#      (tools/bench_chunk_sweep.py with debug_zero configs)
#   4. full-size torch->flax logits parity on the TPU (VERDICT-3 item 8)
# IMPORTANT (round-4 lesson): keep the box otherwise idle — this host has
# ONE core, and starving the tunnel relay of CPU wedges the TPU session.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

bash tools/tpu_poll.sh || exit 1

NOW=$(date +%s)
DEADLINE=${DEADLINE_EPOCH:-$((NOW + 6000))}
left() { echo $(( DEADLINE - $(date +%s) )); }

# ---- stage 1: b4 resume (skip if training already hit 20k) ----
if ! grep -q "^done:" train_b4_r4.log 2>/dev/null && [ "$(left)" -gt 1500 ]; then
  nohup python -u -m e2e_parking_carla_tpu.cli.train \
    --config config/training.yaml --steps 20000 \
    --resume ./ckpt_b4_r4b \
    --probe_every 2500 \
    --probe_export checkpoints/policy_b4_r4_best.msgpack.gz \
    --image_log_dir artifacts/trainlog_b4_r4 \
    --dagger_timeout_keep 4 --near_frac 0.5 --dagger_late_boost 2.0 \
    --mirror_aug \
    >> train_b4_r4.log 2>&1 &
  echo $! > /tmp/train_b4_r4.pid
  # hold until the deadline or completion, then release the chip
  while [ "$(left)" -gt 900 ]; do
    grep -q "^done:" train_b4_r4.log 2>/dev/null && break
    kill -0 "$(cat /tmp/train_b4_r4.pid)" 2>/dev/null || break
    sleep 60
  done
  kill "$(cat /tmp/train_b4_r4.pid)" 2>/dev/null
  sleep 15
  kill -9 "$(cat /tmp/train_b4_r4.pid)" 2>/dev/null
  sleep 5
fi

# ---- stage 2: b4 protocol eval (only when training finished; a partial
# schedule's probe-best is evaluated by round 5 instead) ----
if grep -q "^done:" train_b4_r4.log 2>/dev/null \
    && [ ! -d eva_result_b4_r4 ] && [ "$(left)" -gt 2000 ]; then
  timeout 2400 python -u -m e2e_parking_carla_tpu.cli.evaluate \
    --weights checkpoints/policy_b4_r4_best.msgpack.gz \
    --model_config_path config/training.yaml \
    --eva_result_path eva_result_b4_r4 >> train_b4_r4.log 2>&1
  timeout 2400 python -u -m e2e_parking_carla_tpu.cli.evaluate \
    --weights checkpoints/policy_b4_r4_best.msgpack.gz \
    --model_config_path config/training.yaml --mirror_ensemble \
    --eva_result_path eva_result_b4_r4_me >> train_b4_r4.log 2>&1
fi

# ---- stage 3: render floor attribution sweep ----
if [ ! -f bench_floor_r4.log ]; then
  timeout 2400 python -u tools/bench_chunk_sweep.py \
    '{}' \
    '{"debug_zero":["lines"]}' \
    '{"debug_zero":["lines","ground"]}' \
    '{"debug_zero":["lines","ground","sky"]}' \
    '{"debug_zero":["pack"]}' \
    '{"debug_no_boxes":true}' \
    '{"box_switch":"single"}' \
    '{"box_switch":"always"}' \
    '{"n_sectors":2,"n_boxes":4}' \
    '{"n_sectors":2,"n_boxes":5}' \
    '{"skip_sky":false}' \
    > bench_floor_r4.log 2>&1
fi

# ---- stage 4: full-size torch parity on the TPU ----
if [ ! -f torch_parity_full.log ]; then
  timeout 2400 python -u tools/torch_parity_full.py \
    > torch_parity_full.log 2>&1
fi
echo "=== r4 revival queue done at $(date +%T) ==="
