#!/bin/bash
# Round-4 b4 parity run (VERDICT-3 item 2): the paper's backbone
# (config/training.yaml verbatim, efficientnet-b4) with the recipe that
# produced the 90.10-TSR b0 flagship, warm-started from that flagship's
# BEV/fusion/decoder weights (--init_from; everything downstream of the
# camera encoder is shape-identical across b0/b4 — the camera trunk
# trains from scratch, our analog of the reference's ImageNet-pretrained
# trunk, cam_encoder.py:17). 50k steps ~= 4.4 h on one v5e; on completion
# the full 384-case protocol runs twice (plain + --mirror_ensemble).
set -u
cd /root/repo
STEPS=${1:-50000}
LOG=train_b4_r4.log
PIDFILE=/tmp/train_b4_r4.pid
ARGS=(--config config/training.yaml --steps "$STEPS"
      --probe_every 2500
      --probe_export checkpoints/policy_b4_r4_best.msgpack.gz
      --image_log_dir artifacts/trainlog_b4_r4
      --dagger_timeout_keep 4 --near_frac 0.5 --mirror_aug
      --init_from checkpoints/policy_b0_r4_best.msgpack.gz)

export PYTHONPATH="/root/repo:/root/.axon_site"

(
  python -u -m e2e_parking_carla_tpu.cli.train "${ARGS[@]}" \
    > "$LOG" 2>&1
  echo "=== b4 protocol eval (plain) ===" >> "$LOG"
  timeout 2400 python -u -m e2e_parking_carla_tpu.cli.evaluate \
    --weights checkpoints/policy_b4_r4_best.msgpack.gz \
    --model_config_path config/training.yaml \
    --eva_result_path eva_result_b4_r4 >> "$LOG" 2>&1
  echo "=== b4 protocol eval (mirror ensemble) ===" >> "$LOG"
  timeout 2400 python -u -m e2e_parking_carla_tpu.cli.evaluate \
    --weights checkpoints/policy_b4_r4_best.msgpack.gz \
    --model_config_path config/training.yaml --mirror_ensemble \
    --eva_result_path eva_result_b4_r4_me >> "$LOG" 2>&1
  echo "=== b4 queue done ===" >> "$LOG"
) &
echo $! > "$PIDFILE"
echo "launched queue pid $(cat $PIDFILE)"
