#!/bin/bash
# Round-4 chip queue behind the b4 run (tools/launch_b4_r4.sh):
#   parity  — full-size torch->flax logits parity on the TPU (~15 min,
#             VERDICT-3 item 8)
#   mlp     — MLP-decoder ablation at the matched 30k flagship budget +
#             recipe levers (probe_every 2500 to fit the wall clock), then
#             the full 384-case protocol eval (VERDICT-3 item 3)
#   nodepth — w/o-depth ablation, same shape (runs only if time remains)
#   dart    — sigma sweep {0.02,0.05,0.10} x 6k steps (VERDICT-3 item 7)
#
# Every stage runs under a hard wall-clock DEADLINE (epoch seconds): a
# stage is skipped unless its estimate fits, and its process is bounded by
# `timeout` so the chip is guaranteed free for the driver's end-of-round
# bench.py (a second TPU client would block forever).
# Usage: DEADLINE=<epoch> tools/launch_ablations_r4.sh [steps] &
set -u
cd /root/repo
STEPS=${1:-30000}
DEADLINE=${DEADLINE:?set DEADLINE (epoch seconds)}
export PYTHONPATH="/root/repo:/root/.axon_site"

left() { echo $(( DEADLINE - $(date +%s) )); }
fits() {  # fits <estimate-seconds> <label>
  if [ "$(left)" -lt "$1" ]; then
    echo "SKIP $2: $(left)s left < $1s estimate"; return 1
  fi
  return 0
}

while ! grep -q "=== b4 queue done ===" train_b4_r4.log 2>/dev/null; do
  [ "$(left)" -le 0 ] && { echo "deadline hit waiting for b4"; exit 0; }
  sleep 120
done

if fits 1200 parity; then
  echo "=== full-size torch parity (TPU) ==="
  timeout "$(left)" python -u tools/torch_parity_full.py \
    2>&1 | tee torch_parity_full.log
fi

run () {  # name config train-estimate
  local name=$1 config=$2 est=$3
  fits "$est" "$name-train" || return 1
  echo "=== ablation: $name ($STEPS steps, flagship recipe) ==="
  timeout "$(left)" python -u -m e2e_parking_carla_tpu.cli.train \
    --config "$config" --steps "$STEPS" --probe_every 2500 \
    --probe_export "checkpoints/policy_${name}_r4_best.msgpack.gz" \
    --dagger_timeout_keep 4 --near_frac 0.5 --dagger_late_boost 2.0 \
    --mirror_aug \
    > "train_${name}_r4.log" 2>&1
  fits 1500 "$name-eval" || return 1
  echo "=== protocol eval: $name ==="
  timeout "$(left)" python -u -m e2e_parking_carla_tpu.cli.evaluate \
    --weights "checkpoints/policy_${name}_r4_best.msgpack.gz" \
    --model_config_path "$config" \
    --eva_result_path "eva_result_${name}_r4"
}

run b0_mlp config/training_b0_mlp.yaml 7800
run b0_nodepth config/training_b0_nodepth.yaml 7800

for sig in 0.02 0.05 0.10; do
  fits 2400 "dart-$sig" || break
  acc=$(python -c "print(round($sig*0.6,3))")
  echo "=== DART sweep: steer_sigma=$sig accel_sigma=$acc ==="
  timeout "$(left)" python -u -m e2e_parking_carla_tpu.cli.train \
    --config config/training_b0.yaml --steps 6000 --probe_every 1500 \
    --dart_steer "$sig" --dart_accel "$acc" \
    --probe_export "checkpoints/policy_b0_dart_s${sig}.msgpack.gz" \
    > "train_b0_dart_s${sig}.log" 2>&1
  grep "probe" "train_b0_dart_s${sig}.log" | tail -4
done
echo "=== r4 ablations done ==="
