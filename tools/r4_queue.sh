#!/bin/bash
# Round-3-remainder chip queue (one v5e; one holder at a time).
# Stages in priority order toward the VERDICT-2 gate (TSR>=75, CR<=5):
#   c3eval  — protocol eval of the cycle-3 recovery-lever checkpoint
#   flageval_me — flagship + test-time mirror ensembling (no retraining)
#   train   — FRESH 30k b0 run: flagship recipe + timeout-keep + near-band
#             upweight + late CR-targeted DAgger boost (untried combo),
#             under the stall watchdog
#   r4eval  — protocol eval of that run's probe-best export
#   sweep   — renderer (bands, packed) hardware A/B
#   bench   — headline bench.py
#   nodepth — paper Table III ablation: w/o depth supervision (time-bounded)
#   mlp     — paper Table III ablation: MLP decoder (time-bounded)
#   nosl    — paper Table III ablation: --no_speed_limit eval of the best ckpt
#   b4      — long b4 parity run (fills remaining wall clock, resumable)
# Each stage skips itself if its output artifact already exists, so the
# script is safe to re-run after an outage. Usage:
#   tools/r4_queue.sh [stage|all]
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

best_ckpt() {
  # prefer the fresh-run export once it exists and beat the flagship
  if [ -f /tmp/r4_best_is_r4 ]; then
    echo checkpoints/policy_b0_r4_best.msgpack.gz
  else
    echo checkpoints/policy_b0_r3_best.msgpack.gz
  fi
}

stage_c3eval() {
  [ -d eva_result_b0_r3c3 ] && { echo "c3eval: exists, skip"; return; }
  timeout 2400 python -u -m e2e_parking_carla_tpu.cli.evaluate \
    --weights checkpoints/policy_b0_r3c3_best.msgpack.gz \
    --model_config_path config/training_b0.yaml \
    --eva_result_path eva_result_b0_r3c3
}

stage_train() {
  [ -f checkpoints/policy_b0_r4_best.msgpack.gz ] && \
    { echo "train: export exists, skip"; return; }
  LOG=train_b0_r4.log PIDFILE=/tmp/train_b0_r4.pid
  ARGS=(--config config/training_b0.yaml --steps 30000 --probe_every 1000
        --probe_export checkpoints/policy_b0_r4_best.msgpack.gz
        --image_log_dir artifacts/trainlog_b0_r4
        --dagger_timeout_keep 4 --near_frac 0.5 --dagger_late_boost 2.0
        --mirror_aug)
  nohup python -u -m e2e_parking_carla_tpu.cli.train "${ARGS[@]}" \
    > "$LOG" 2>&1 &
  echo $! > "$PIDFILE"
  echo "train: pid $(cat $PIDFILE)"
  EXP=""
  for i in $(seq 1 120); do
    EXP=$(grep -m1 "^checkpoints -> " "$LOG" 2>/dev/null | sed 's/^checkpoints -> //')
    [ -n "$EXP" ] && break
    sleep 5
  done
  echo "train: exp dir $EXP"
  nohup bash tools/r3_watchdog.sh "$LOG" "$PIDFILE" "$EXP" "${ARGS[@]}" \
    > /dev/null 2>&1 &
  echo $! > /tmp/wd_b0_r4.pid
  # block until the run logs completion (watchdog restarts it on stalls)
  while ! grep -q "^done:" "$LOG" 2>/dev/null; do sleep 120; done
  kill "$(cat /tmp/wd_b0_r4.pid)" 2>/dev/null
  echo "train: done"
}

stage_flageval_me() {
  # test-time mirror ensembling on the EXISTING flagship: targets the
  # measured chiral failure anatomy (-90 starts TSR ~60 vs +90 ~78)
  # without any retraining; ~2x AIT
  [ -d eva_result_b0_r3_me ] && { echo "flageval_me: exists, skip"; return; }
  timeout 3600 python -u -m e2e_parking_carla_tpu.cli.evaluate \
    --weights checkpoints/policy_b0_r3_best.msgpack.gz \
    --model_config_path config/training_b0.yaml --mirror_ensemble \
    --eva_result_path eva_result_b0_r3_me
}

stage_r4eval() {
  [ -f checkpoints/policy_b0_r4_best.msgpack.gz ] || \
    { echo "r4eval: no export"; return; }
  [ -d eva_result_b0_r4 ] || \
  timeout 2400 python -u -m e2e_parking_carla_tpu.cli.evaluate \
    --weights checkpoints/policy_b0_r4_best.msgpack.gz \
    --model_config_path config/training_b0.yaml \
    --eva_result_path eva_result_b0_r4
  [ -d eva_result_b0_r4_me ] || \
  timeout 3600 python -u -m e2e_parking_carla_tpu.cli.evaluate \
    --weights checkpoints/policy_b0_r4_best.msgpack.gz \
    --model_config_path config/training_b0.yaml --mirror_ensemble \
    --eva_result_path eva_result_b0_r4_me
  # mark the r4 export as the downstream default iff it beats the flagship
  # on the deploy score (TSR - 2*CR, the probe selection metric)
  python - <<'EOF' && touch /tmp/r4_best_is_r4 || true
import csv, sys
def score(d):
    with open(d + "/result_mean.csv") as f:
        row = next(csv.DictReader(f))
    return float(row["TSR"]) - 2.0 * float(row["CR"])
sys.exit(0 if score("eva_result_b0_r4") > score("eva_result_b0_r3") else 1)
EOF
}

stage_sweep() {
  timeout 2400 python -u tools/bench_render_ab.py | tee /tmp/render_ab.txt
}

stage_bench() {
  timeout 1200 python -u bench.py
}

stage_nodepth() {
  [ -d eva_result_b0_nodepth ] && { echo "nodepth: exists, skip"; return; }
  timeout 5400 python -u -m e2e_parking_carla_tpu.cli.train \
    --config config/training_b0_nodepth.yaml --steps 12000 --probe_every 1500 \
    --probe_export checkpoints/policy_b0_nodepth_best.msgpack.gz \
    > train_b0_nodepth.log 2>&1
  echo "nodepth train rc=$?"
  [ -f checkpoints/policy_b0_nodepth_best.msgpack.gz ] && \
  timeout 2400 python -u -m e2e_parking_carla_tpu.cli.evaluate \
    --weights checkpoints/policy_b0_nodepth_best.msgpack.gz \
    --model_config_path config/training_b0_nodepth.yaml \
    --eva_result_path eva_result_b0_nodepth
}

stage_mlp() {
  [ -d eva_result_b0_mlp ] && { echo "mlp: exists, skip"; return; }
  timeout 5400 python -u -m e2e_parking_carla_tpu.cli.train \
    --config config/training_b0_mlp.yaml --steps 12000 --probe_every 1500 \
    --probe_export checkpoints/policy_b0_mlp_best.msgpack.gz \
    > train_b0_mlp.log 2>&1
  echo "mlp train rc=$?"
  [ -f checkpoints/policy_b0_mlp_best.msgpack.gz ] && \
  timeout 2400 python -u -m e2e_parking_carla_tpu.cli.evaluate \
    --weights checkpoints/policy_b0_mlp_best.msgpack.gz \
    --model_config_path config/training_b0_mlp.yaml \
    --eva_result_path eva_result_b0_mlp
}

stage_nosl() {
  [ -d eva_result_b0_nosl ] && { echo "nosl: exists, skip"; return; }
  timeout 2400 python -u -m e2e_parking_carla_tpu.cli.evaluate \
    --weights "$(best_ckpt)" \
    --model_config_path config/training_b0.yaml --no_speed_limit \
    --eva_result_path eva_result_b0_nosl
}

stage_b4() {
  bash tools/launch_b4_r4.sh
}

run_stage() {
  echo "=== stage $1 start $(date +%T) ==="
  "stage_$1"
  echo "=== stage $1 end $(date +%T) ==="
}

case "${1:-all}" in
  all)
    bash tools/tpu_poll.sh || exit 1
    # b4 (resumable across rounds) outranks the MLP ablation (VERDICT-2
    # item 3 vs 4); it runs last because it absorbs all remaining wall
    # clock. mlp only runs if b4 is skipped/finished.
    for s in c3eval flageval_me train r4eval sweep bench nodepth nosl b4 mlp; do
      run_stage "$s"
    done
    ;;
  *) run_stage "$1" ;;
esac
