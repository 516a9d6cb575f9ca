#!/bin/bash
# Round-4 ablation runs (paper Table III, BASELINE.md; VERDICT-3 item 3):
# the MLP-decoder and w/o-depth-supervision variants at the FLAGSHIP
# budget and recipe (30k steps, probe_every 1000, timeout-keep, near-band
# upweight, late DAgger boost, mirror aug — exactly tools/r4_queue.sh
# stage_train), so the rows are comparable to the eva_result_b0_r4
# baseline instead of the budget-confounded 12k round-3 rows. Each run is
# followed by the full 384-case protocol eval.
#
# Waits for the b4 queue (tools/launch_b4_r4.sh) to release the chip.
# Usage: tools/launch_ablations_r4.sh [steps] &
set -u
cd /root/repo
STEPS=${1:-30000}
export PYTHONPATH="/root/repo:/root/.axon_site"

while ! grep -q "=== b4 queue done ===" train_b4_r4.log 2>/dev/null; do
  sleep 120
done

run () {  # name config
  local name=$1 config=$2
  echo "=== ablation: $name ($STEPS steps, flagship recipe) ==="
  timeout 14400 python -u -m e2e_parking_carla_tpu.cli.train \
    --config "$config" --steps "$STEPS" --probe_every 1000 \
    --probe_export "checkpoints/policy_${name}_r4_best.msgpack.gz" \
    --dagger_timeout_keep 4 --near_frac 0.5 --dagger_late_boost 2.0 \
    --mirror_aug \
    > "train_${name}_r4.log" 2>&1
  echo "=== protocol eval: $name ==="
  timeout 2400 python -u -m e2e_parking_carla_tpu.cli.evaluate \
    --weights "checkpoints/policy_${name}_r4_best.msgpack.gz" \
    --model_config_path "$config" \
    --eva_result_path "eva_result_${name}_r4"
}

run b0_mlp config/training_b0_mlp.yaml
run b0_nodepth config/training_b0_nodepth.yaml
echo "=== r4 ablations done ==="
