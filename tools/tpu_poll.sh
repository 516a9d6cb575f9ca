#!/bin/bash
# Poll until the axon TPU tunnel answers, then exit 0. Run in background;
# the exit is the "chip is back" signal. Exits 1 after ~6 h of silence.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
for i in $(seq 1 240); do
  if timeout 90 python -c "import jax; assert jax.devices()" > /dev/null 2>&1; then
    echo "TPU back at $(date +%F' '%T) after $i polls"
    exit 0
  fi
  sleep 60
done
echo "TPU still down at $(date +%F' '%T)"
exit 1
