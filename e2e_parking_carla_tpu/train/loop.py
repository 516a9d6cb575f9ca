"""In-loop imitation training: expert rollouts feeding gradient steps.

The reference trains offline for 150 epochs over 22K disk frames collected
by human drivers (~96 h on a V100, paper §IV-A). Here data generation IS the
input pipeline: a fleet of expert episodes is collected on device
(data/rollout.py), training batches are rendered from state on the fly, and
the buffer is refreshed with new episodes as training progresses
(BASELINE.json config #5).
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
    seed: int = 42,
    log_fn: Optional[Callable] = print,
    ckpt_manager=None,
    state: Optional[trainer_lib.TrainState] = None,
):
    """Run in-loop training. Returns the final TrainState.

    The collect -> train cadence: a buffer of `n_envs` expert episodes is
    (re)collected every `refresh_every` steps; every step samples+renders a
    fresh batch from the buffer on device.
    """
    rng = jax.random.PRNGKey(seed)
    k_collect, k_init, k_batch, k_train = jax.random.split(rng, 4)

    collect = jax.jit(
        lambda key: collect_episodes(key, n_envs, cfg.model, cfg.sim, cfg.eval))
    batch_fn = jax.jit(
        lambda buf, key: make_batch(buf, key, cfg.train.batch_size, cfg.model, cfg.sim))

    t0 = time.time()
    buffer = jax.block_until_ready(collect(k_collect))
    n_valid = int(np.asarray(buffer.valid).sum())
    if log_fn:
        log_fn(f"collected {n_envs} episodes "
               f"({int(np.asarray(buffer.success).sum())} successes, "
               f"{n_valid} training frames) in {time.time()-t0:.1f}s")
    if n_valid == 0:
        raise RuntimeError("no valid training frames collected")

    if state is None:
        sample = batch_fn(buffer, k_batch)
        state = trainer_lib.create_train_state(model, cfg, k_init, sample,
                                               steps_per_epoch=max(total_steps // max(cfg.train.epochs, 1), 1))
    train_step = trainer_lib.make_train_step(
        model, cfg, steps_per_epoch=max(total_steps // max(cfg.train.epochs, 1), 1))
    val_step = trainer_lib.make_val_step(model, cfg)

    for step in range(int(state.step), total_steps):
        if step > 0 and refresh_every > 0 and step % refresh_every == 0:
            buffer = collect(jax.random.fold_in(k_collect, step))
        batch = batch_fn(buffer, jax.random.fold_in(k_batch, step))
        state, metrics = train_step(state, batch, k_train)

        if val_every > 0 and (step + 1) % val_every == 0:
            val_batch = batch_fn(buffer, jax.random.fold_in(k_batch, step + 1_000_000))
            val_metrics = val_step(state, val_batch)
            val_metrics = {k: float(v) for k, v in val_metrics.items()}
            if log_fn:
                tm = {k: round(float(v), 4) for k, v in metrics.items()}
                log_fn(f"step {step + 1}: train={tm} val={ {k: round(v, 4) for k, v in val_metrics.items()} }")
            if ckpt_manager is not None:
                ckpt_manager.save(step + 1, state, metrics=val_metrics)
        elif log_fn and (step + 1) % 50 == 0:
            log_fn(f"step {step + 1}: train_loss={float(metrics['train_loss']):.4f}")

    return state
