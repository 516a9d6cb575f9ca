"""In-loop imitation training: expert rollouts feeding gradient steps.

The reference trains offline for 150 epochs over 22K disk frames collected
by human drivers (~96 h on a V100, paper §IV-A). Here data generation IS the
input pipeline: a fleet of expert episodes is collected on device
(data/rollout.py), training batches are rendered from state on the fly, and
the buffer is refreshed with new episodes as training progresses
(BASELINE.json config #5).

Dispatch structure: `chunk` training steps — batch sampling, rendering, and
fwd/bwd/Adam — are fused into ONE jitted lax.scan per host call. Per-call
dispatch latency (large on remote/tunneled backends) amortizes across the
chunk, and XLA overlaps the render of step i+1 with the grads of step i.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import numpy as np

from e2e_parking_carla_tpu.config import Config
from e2e_parking_carla_tpu.data.rollout import collect_episodes, make_batch
from e2e_parking_carla_tpu.train import trainer as trainer_lib


def train_loop(
    model,
    cfg: Config,
    total_steps: int,
    n_envs: int = 64,
    refresh_every: int = 500,
    val_every: int = 200,
    chunk: int = 25,
    seed: int = 42,
    log_fn: Optional[Callable] = print,
    ckpt_manager=None,
    state: Optional[trainer_lib.TrainState] = None,
):
    """Run in-loop training. Returns the final TrainState.

    Cadence: every `refresh_every` steps the episode buffer is re-collected;
    training advances `chunk` fused steps per device call; every `val_every`
    steps validation runs and (optionally) a checkpoint is saved.
    """
    rng = jax.random.PRNGKey(seed)
    k_collect, k_init, k_batch, k_train = jax.random.split(rng, 4)
    steps_per_epoch = max(total_steps // max(cfg.train.epochs, 1), 1)

    collect = jax.jit(
        lambda key: collect_episodes(key, n_envs, cfg.model, cfg.sim, cfg.eval))
    batch_fn = jax.jit(
        lambda buf, key: make_batch(buf, key, cfg.train.batch_size, cfg.model, cfg.sim))

    def log(msg):
        if log_fn:
            log_fn(msg, flush=True) if log_fn is print else log_fn(msg)

    t0 = time.time()
    buffer = jax.block_until_ready(collect(k_collect))
    n_valid = int(np.asarray(buffer.valid).sum())
    log(f"collected {n_envs} episodes "
        f"({int(np.asarray(buffer.success).sum())} successes, "
        f"{n_valid} training frames) in {time.time()-t0:.1f}s")
    if n_valid == 0:
        raise RuntimeError("no valid training frames collected")

    if state is None:
        sample = batch_fn(buffer, k_batch)
        state = trainer_lib.create_train_state(model, cfg, k_init, sample,
                                               steps_per_epoch=steps_per_epoch)
    val_step = trainer_lib.make_val_step(model, cfg)
    inner_step = trainer_lib.build_train_step(model, cfg, steps_per_epoch)

    @jax.jit
    def run_chunk(st, buf, key):
        keys = jax.random.split(key, chunk)

        def body(carry, k_i):
            s = carry
            batch = make_batch(buf, k_i, cfg.train.batch_size, cfg.model, cfg.sim)
            s, metrics = inner_step(s, batch, k_train)
            return s, metrics["train_loss"]

        st, losses = jax.lax.scan(body, st, keys)
        return st, losses

    step = int(state.step)
    last_log = time.time()

    def next_multiple(every):
        if every <= 0:
            return total_steps + 1
        return ((step // every) + 1) * every

    next_refresh = next_multiple(refresh_every)
    next_val = next_multiple(val_every)
    while step < total_steps:
        if step >= next_refresh:
            buffer = collect(jax.random.fold_in(k_collect, step))
            next_refresh = ((step // refresh_every) + 1) * refresh_every
        state, losses = run_chunk(state, buffer, jax.random.fold_in(k_batch, step))
        step = int(state.step)

        if step >= next_val:
            next_val += val_every * ((step - next_val) // val_every + 1)
            val_batch = batch_fn(buffer, jax.random.fold_in(k_batch, step + 10**6))
            val_metrics = {k: float(v) for k, v in val_step(state, val_batch).items()}
            rate = val_every / max(time.time() - last_log, 1e-9)
            last_log = time.time()
            log(f"step {step}: train_loss={float(losses[-1]):.4f} "
                f"val={ {k: round(v, 4) for k, v in val_metrics.items()} } "
                f"({rate:.2f} steps/s)")
            if ckpt_manager is not None:
                ckpt_manager.save(step, state, metrics=val_metrics)

    return state
