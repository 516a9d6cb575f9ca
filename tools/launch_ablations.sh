#!/bin/bash
# Round-3 ablation runs (paper Table III, BASELINE.md): train the
# w/o-depth-supervision and MLP-decoder variants at an equal fixed budget
# with the same probe machinery as the flagship, then run the full
# 384-case protocol on each best export. The baseline row at the same
# budget is the flagship run's logged probe at the matching step.
# Usage: tools/launch_ablations.sh [steps]
set -u
cd /root/repo
STEPS=${1:-15000}
export PYTHONPATH="/root/repo:/root/.axon_site"

run () {  # name config
  local name=$1 config=$2
  echo "=== ablation: $name ($STEPS steps) ==="
  timeout 14400 python -u -m e2e_parking_carla_tpu.cli.train \
    --config "$config" --steps "$STEPS" --probe_every 1000 \
    --probe_export "checkpoints/policy_${name}_best.msgpack.gz" \
    > "train_${name}.log" 2>&1
  echo "=== protocol eval: $name ==="
  timeout 1800 python -u -m e2e_parking_carla_tpu.cli.evaluate \
    --weights "checkpoints/policy_${name}_best.msgpack.gz" \
    --model_config_path "$config" \
    --eva_result_path "eva_result_${name}"
}

run b0_nodepth config/training_b0_nodepth.yaml
run b0_mlp config/training_b0_mlp.yaml
echo "=== ablations done ==="
