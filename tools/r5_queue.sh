#!/bin/bash
# Round-5 serialized chip queue. One TPU client at a time, box otherwise
# idle (ONE core: CPU contention wedges the tunnel relay — see STATUS.md
# "tunnel incidents"). Stages, in priority order (VERDICT-4):
#   bench   — driver-bench gate at the new render defaults (item 1)
#   sweep   — fresh 11-config floor sweep at the new defaults
#   b4      — resume the b4 warm-start run to 20k (item 3)
#   b4eval  — protocol eval plain + mirror ensemble (separate sentinels)
#   parity  — full-size torch->flax logits parity on the TPU (item 6)
#   mlp     — MLP-decoder ablation @ matched 30k budget + eval (item 4)
#   nodepth — w/o-depth ablation, same shape (only if time remains)
#   dart    — sigma sweep {0.02,0.05,0.10} x 6k steps (item 8)
#
# ADVICE-4 fixes vs r4_revival.sh: every stage's process is bounded by
# timeout $(left) so nothing holds the chip past DEADLINE, and a stage is
# only skipped when its .done sentinel exists — written IFF the stage's
# command exited 0 (log existence no longer counts as success).
# Usage: DEADLINE_EPOCH=<epoch> nohup bash tools/r5_queue.sh > r5_queue.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
# Persistent XLA compilation cache shared by every stage's process: the
# two protocol evals run the same program (second compile is free), and a
# crashed/killed stage re-runs warm instead of paying the full compile.
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache_tpu
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
mkdir -p artifacts/r5_done "$JAX_COMPILATION_CACHE_DIR"

NOW=$(date +%s)
DEADLINE=${DEADLINE_EPOCH:-$((NOW + 21600))}
left() { echo $(( DEADLINE - $(date +%s) )); }
done_f() { echo "artifacts/r5_done/$1.done"; }
fits() {  # fits <estimate-seconds> <label>
  if [ "$(left)" -lt "$1" ]; then
    echo "SKIP $2: $(left)s left < $1s estimate"; return 1
  fi
  return 0
}
stage() {  # stage <name> <estimate-seconds> <cmd...>  — sentinel iff rc==0
  local name=$1 est=$2; shift 2
  [ -f "$(done_f "$name")" ] && { echo "skip $name (done)"; return 0; }
  fits "$est" "$name" || return 1
  echo "=== stage $name ($(left)s left) at $(date +%T) ==="
  timeout "$(left)" "$@"
  local rc=$?
  if [ "$rc" -eq 0 ]; then date +%s > "$(done_f "$name")"; else
    echo "stage $name FAILED rc=$rc"; fi
  return "$rc"
}

bash tools/tpu_poll.sh || exit 1

# ---- bench gate: the driver metric at the new defaults ----
stage bench 600 bash -c 'python -u bench.py 2>&1 | tee bench_r5_gate.log'

# ---- b4 resume to 20k (resumable: orbax state in ./ckpt_b4_r4b) ----
# RESERVE: wall clock the stages after training need. Round-5 budget is
# ~2.3h of chip, so RESERVE covers the plain protocol eval (~2000s) +
# one more stage (mirror eval OR torch parity, whichever fits) + margin;
# VERDICT-4 ranks a COMPLETED 20k b4 run + plain row above the second
# eval, so training keeps the chip as long as possible. The train loop
# below hands the chip over once only RESERVE is left, so the eval that
# turns the run into a protocol row can never be starved by training
# (round-4 lesson: a 900s floor skipped every downstream stage).
RESERVE=${RESERVE:-3400}
# --steps 16000 (not the original 20000): the round-5 chip window fits
# ~13.6k more steps, so a cosine that ANNEALS FULLY by 16k beats a 20k
# schedule cut un-annealed at the same wall clock. Resume restores step
# 2400 + Adam moments; the LR follows the new 16k curve from there.
if ! grep -q "^done:" train_b4_r5.log 2>/dev/null; then
  if fits $((RESERVE + 1200)) b4-resume; then
    nohup python -u -m e2e_parking_carla_tpu.cli.train \
      --config config/training.yaml --steps 16000 \
      --resume ./ckpt_b4_r4b \
      --probe_every 2500 \
      --probe_export checkpoints/policy_b4_r4_best.msgpack.gz \
      --image_log_dir artifacts/trainlog_b4_r4 \
      --dagger_timeout_keep 4 --near_frac 0.5 --dagger_late_boost 2.0 \
      --mirror_aug \
      >> train_b4_r5.log 2>&1 &
    echo $! > /tmp/train_b4_r5.pid
    while [ "$(left)" -gt "$RESERVE" ]; do
      grep -q "^done:" train_b4_r5.log 2>/dev/null && break
      kill -0 "$(cat /tmp/train_b4_r5.pid)" 2>/dev/null || break
      sleep 60
    done
    kill "$(cat /tmp/train_b4_r5.pid)" 2>/dev/null
    sleep 20
    kill -9 "$(cat /tmp/train_b4_r5.pid)" 2>/dev/null
    sleep 10
    # After killing a TPU client the server can reap the hold slowly
    # (STATUS.md "tunnel incidents"); wait for the chip before evals.
    bash tools/tpu_poll.sh || exit 1
  fi
fi

# ---- b4 protocol evals (probe-best; runs even if training was cut —
# the probe-best export is always the best selection so far) ----
stage b4eval 2000 python -u -m e2e_parking_carla_tpu.cli.evaluate \
  --weights checkpoints/policy_b4_r4_best.msgpack.gz \
  --model_config_path config/training.yaml \
  --eva_result_path eva_result_b4_r5
stage b4eval_me 2000 python -u -m e2e_parking_carla_tpu.cli.evaluate \
  --weights checkpoints/policy_b4_r4_best.msgpack.gz \
  --model_config_path config/training.yaml --mirror_ensemble \
  --eva_result_path eva_result_b4_r5_me

# ---- full-size torch->flax parity on the TPU ----
stage parity 1200 bash -c 'python -u tools/torch_parity_full.py \
  > torch_parity_full.log 2>&1'

# ---- fresh floor sweep at the new defaults (box_switch="single") ----
stage sweep 1500 bash -c 'python -u tools/bench_chunk_sweep.py \
  "{}" \
  "{\"debug_zero\":[\"lines\"]}" \
  "{\"debug_zero\":[\"lines\",\"ground\"]}" \
  "{\"debug_zero\":[\"lines\",\"ground\",\"sky\"]}" \
  "{\"debug_zero\":[\"pack\"]}" \
  "{\"debug_no_boxes\":true}" \
  "{\"box_switch\":\"nested\"}" \
  "{\"box_switch\":\"always\"}" \
  "{\"unroll_envs\":false}" \
  "{\"env_chunk\":16}" \
  "{\"skip_sky\":false}" \
  > bench_floor_r5.log 2>&1'

# ---- matched-budget Table III ablations ----
ablation() {  # ablation <name> <config>
  local name=$1 config=$2
  stage "${name}_train" 7800 bash -c "python -u -m e2e_parking_carla_tpu.cli.train \
    --config $config --steps 30000 --probe_every 2500 \
    --probe_export checkpoints/policy_${name}_r5_best.msgpack.gz \
    --dagger_timeout_keep 4 --near_frac 0.5 --dagger_late_boost 2.0 \
    --mirror_aug > train_${name}_r5.log 2>&1" || return 1
  stage "${name}_eval" 1800 bash -c "python -u -m e2e_parking_carla_tpu.cli.evaluate \
    --weights checkpoints/policy_${name}_r5_best.msgpack.gz \
    --model_config_path $config \
    --eva_result_path eva_result_${name}_r5 >> train_${name}_r5.log 2>&1"
}
ablation b0_mlp config/training_b0_mlp.yaml

# ---- terminal-precision fine-tune (VERDICT-4 item 7): warm-start the b0
# flagship, short fresh cosine with the last-2s-of-episode frames
# upweighted 4x (TrainConfig.goal_boost). Target: APE 0.65 -> <=0.45 m at
# TSR >= 90.
stage goalft_train 4200 bash -c 'python -u -m e2e_parking_carla_tpu.cli.train \
  --config config/training_b0.yaml --steps 8000 --probe_every 1500 \
  --init_from checkpoints/policy_b0_r4_best.msgpack.gz --init_skip "" \
  --probe_export checkpoints/policy_b0_goalft_best.msgpack.gz \
  --dagger_timeout_keep 4 --near_frac 0.5 \
  --mirror_aug --goal_boost 4.0 --goal_window 20 \
  > train_b0_goalft.log 2>&1'
stage goalft_eval 2000 bash -c 'python -u -m e2e_parking_carla_tpu.cli.evaluate \
  --weights checkpoints/policy_b0_goalft_best.msgpack.gz \
  --model_config_path config/training_b0.yaml \
  --eva_result_path eva_result_b0_goalft >> train_b0_goalft.log 2>&1'
stage goalft_eval_me 2000 bash -c 'python -u -m e2e_parking_carla_tpu.cli.evaluate \
  --weights checkpoints/policy_b0_goalft_best.msgpack.gz \
  --model_config_path config/training_b0.yaml --mirror_ensemble \
  --eva_result_path eva_result_b0_goalft_me >> train_b0_goalft.log 2>&1'

ablation b0_nodepth config/training_b0_nodepth.yaml

# ---- DART sigma sweep ----
for sig in 0.02 0.05 0.10; do
  acc=$(python -c "print(round($sig*0.6,3))")
  stage "dart_$sig" 2400 bash -c "python -u -m e2e_parking_carla_tpu.cli.train \
    --config config/training_b0.yaml --steps 6000 --probe_every 1500 \
    --dart_steer $sig --dart_accel $acc \
    --probe_export checkpoints/policy_b0_dart_s${sig}.msgpack.gz \
    > train_b0_dart_s${sig}.log 2>&1" || break
done

echo "=== r5 queue done at $(date +%T), $(left)s before deadline ==="
