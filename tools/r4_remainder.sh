#!/bin/bash
# Round-3-remainder queue, part 2 (after the r4 flagship evals landed):
#   ablate  — paper Table III at a SAME-BUDGET baseline: three 12k-step b0
#             runs (baseline / w/o depth / MLP decoder), all with the full
#             flagship recipe levers, each followed by the 384-case
#             protocol eval. The nosl row reuses the flagship (eval-only,
#             already measured: eva_result_b0_nosl).
#   b4      — the 75k b4 parity run, hard-bounded by DEADLINE_EPOCH so the
#             chip is free for the driver's end-of-round bench/dryrun.
# Stages skip themselves if their artifact exists; safe to re-run.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

LEVERS=(--dagger_timeout_keep 4 --near_frac 0.5 --dagger_late_boost 2.0
        --mirror_aug)

run_one() { # name config
  local name=$1 cfg=$2
  [ -d "eva_result_b0_$name" ] && { echo "$name: exists, skip"; return; }
  timeout 9000 python -u -m e2e_parking_carla_tpu.cli.train \
    --config "$cfg" --steps 12000 --probe_every 1500 \
    --probe_export "checkpoints/policy_b0_${name}_best.msgpack.gz" \
    "${LEVERS[@]}" > "train_b0_${name}.log" 2>&1
  echo "$name train rc=$?"
  [ -f "checkpoints/policy_b0_${name}_best.msgpack.gz" ] && \
  timeout 2400 python -u -m e2e_parking_carla_tpu.cli.evaluate \
    --weights "checkpoints/policy_b0_${name}_best.msgpack.gz" \
    --model_config_path "$cfg" \
    --eva_result_path "eva_result_b0_$name"
}

stage_ablate() {
  run_one base12k config/training_b0.yaml
  run_one nodepth config/training_b0_nodepth.yaml
  run_one mlp config/training_b0_mlp.yaml
}

stage_b4() {
  # DEADLINE_EPOCH: unix time by which the chip must be released.
  local now left
  now=$(date +%s)
  left=$(( ${DEADLINE_EPOCH:-$((now + 14400))} - now ))
  [ "$left" -lt 1200 ] && { echo "b4: <20min left, skip"; return; }
  echo "b4: running for ${left}s"
  LOG=train_b4_r4.log PIDFILE=/tmp/train_b4_r4.pid
  ARGS=(--config config/training.yaml --steps 75000
        --probe_every 2000
        --probe_export checkpoints/policy_b4_r4_best.msgpack.gz
        --image_log_dir artifacts/trainlog_b4_r4
        "${LEVERS[@]}")
  [ -f "$LOG" ] && ARGS+=(--resume)
  nohup python -u -m e2e_parking_carla_tpu.cli.train "${ARGS[@]}" \
    >> "$LOG" 2>&1 &
  echo $! > "$PIDFILE"
  EXP=""
  for i in $(seq 1 120); do
    EXP=$(grep -m1 "^checkpoints -> " "$LOG" 2>/dev/null | sed 's/^checkpoints -> //')
    [ -n "$EXP" ] && break
    sleep 5
  done
  nohup bash tools/r3_watchdog.sh "$LOG" "$PIDFILE" "$EXP" "${ARGS[@]}" \
    > /dev/null 2>&1 &
  echo $! > /tmp/wd_b4_r4.pid
  # hold until the deadline (or completion), then release the chip
  while [ "$(date +%s)" -lt "${DEADLINE_EPOCH:-0}" ]; do
    grep -q "^done:" "$LOG" 2>/dev/null && break
    sleep 60
  done
  kill "$(cat /tmp/wd_b4_r4.pid)" 2>/dev/null
  kill "$(cat /tmp/train_b4_r4.pid)" 2>/dev/null
  sleep 10
  kill -9 "$(cat /tmp/train_b4_r4.pid)" 2>/dev/null
  echo "b4: released chip at $(date +%T)"
}

case "${1:-all}" in
  all) stage_ablate; stage_b4 ;;
  *) "stage_$1" ;;
esac
