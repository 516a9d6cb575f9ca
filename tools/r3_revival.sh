#!/bin/bash
# Tunnel-revival queue: polls the TPU until it answers, then runs the
# round-3 remainder in priority order (cycle-3 protocol eval, renderer
# band sweep, w/o-depth ablation time-bounded).
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

for i in $(seq 1 200); do
  if timeout 90 python -c "import jax; jax.devices()" > /dev/null 2>&1; then
    echo "TPU back at $(date +%T)"
    break
  fi
  sleep 90
done
timeout 90 python -c "import jax; jax.devices()" > /dev/null 2>&1 || exit 1

echo "=== protocol eval: cycle-3 best ==="
timeout 1800 python -u -m e2e_parking_carla_tpu.cli.evaluate \
  --weights checkpoints/policy_b0_r3c3_best.msgpack.gz \
  --model_config_path config/training_b0.yaml \
  --eva_result_path eva_result_b0_r3c3

echo "=== render band A/B sweep ==="
timeout 1500 python -u tools/bench_render_ab.py

echo "=== bench.py ==="
timeout 900 python -u bench.py

echo "=== ablation: w/o depth supervision (time-bounded 45 min) ==="
timeout 2700 python -u -m e2e_parking_carla_tpu.cli.train \
  --config config/training_b0_nodepth.yaml --steps 12000 --probe_every 1000 \
  --probe_export checkpoints/policy_b0_nodepth_best.msgpack.gz \
  > train_b0_nodepth.log 2>&1
echo "nodepth rc=$?"
if [ -f checkpoints/policy_b0_nodepth_best.msgpack.gz ]; then
  echo "=== protocol eval: w/o depth ==="
  timeout 1500 python -u -m e2e_parking_carla_tpu.cli.evaluate \
    --weights checkpoints/policy_b0_nodepth_best.msgpack.gz \
    --model_config_path config/training_b0_nodepth.yaml \
    --eva_result_path eva_result_b0_nodepth
fi
echo "=== revival queue done ==="
