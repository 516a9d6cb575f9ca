"""In-loop imitation training: expert rollouts feeding gradient steps.

The reference trains offline for 150 epochs over 22K disk frames collected
by human drivers (~96 h on a V100, paper §IV-A). Here data generation IS the
input pipeline: a fleet of expert episodes is collected on device
(data/rollout.py), training batches are rendered from state on the fly, and
the buffer is refreshed with new episodes as training progresses
(BASELINE.json config #5).

Beyond the reference's recipe (round-1 closed-loop quality findings):

* **DAgger corrections** (data/dagger.py): a slice of every refreshed buffer
  is collected by rolling out the *current policy* with expert labels, so
  the model gets supervision at the states it actually visits.
* **Parameter EMA** (trainer.py): the deploy/eval weight set is an
  exponential moving average of the SGD iterates.
* **Closed-loop probe selection** (probe.py): every `probe_every` steps a
  16-attempt slice of the real protocol scores the EMA weights, and the best
  weights are exported — replacing selection by open-loop val_loss, which
  round-1 measurement showed selects noise.

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
from e2e_parking_carla_tpu.data.dagger import collect_dagger_episodes, concat_buffers
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
    probe_every: int = 0,
    probe_export: Optional[str] = None,
    image_log_dir: Optional[str] = None,
):
    """Run in-loop training. Returns the final TrainState.

    Cadence: every `refresh_every` steps the episode buffer is re-collected
    (with a DAgger slice once the policy has trained, see module docstring);
    training advances `chunk` fused steps per device call; every `val_every`
    steps validation runs and (optionally) a checkpoint is saved; every
    `probe_every` steps (0 disables) a closed-loop probe scores the EMA
    weights and exports the best to `probe_export`.
    """
    rng = jax.random.PRNGKey(seed)
    k_collect, k_init, k_batch, k_train = jax.random.split(rng, 4)
    steps_per_epoch = max(total_steps // max(cfg.train.epochs, 1), 1)

    n_dagger = int(round(n_envs * cfg.train.dagger_envs_frac))
    # late-schedule DAgger boost: once the policy is competent (end of the
    # cosine), a larger correction slice targets CR/TR without the early-
    # schedule timidity risk (round-2 measurement). 1.0 = no boost.
    late_boost = float(getattr(cfg.train, "dagger_late_boost", 1.0))
    late_start = getattr(cfg.train, "dagger_late_frac", 0.85) * total_steps
    n_dagger_late = min(int(round(n_dagger * late_boost)), n_envs) \
        if late_boost > 1.0 and n_dagger else n_dagger
    collect = jax.jit(
        lambda key: collect_episodes(
            key, n_envs, cfg.model, cfg.sim, cfg.eval,
            dart_steer_sigma=getattr(cfg.train, "dart_steer_sigma", 0.0),
            dart_accel_sigma=getattr(cfg.train, "dart_accel_sigma", 0.0),
            dart_tau=getattr(cfg.train, "dart_tau", 0.5),
            dart_trim_scale=getattr(cfg.train, "dart_trim_scale", 0.3),
            start_near_frac=getattr(cfg.train, "start_near_frac", 0.0)))

    def _predict(variables, images, ego_motion, target_point):
        return model.apply(variables, images, ego_motion, target_point,
                           method=model.predict)

    def _make_collect_dagger(n):
        return jax.jit(
            lambda variables, key: collect_dagger_episodes(
                _predict, variables, key, n, cfg.model, cfg.sim, cfg.eval,
                expert_mix=cfg.train.dagger_expert_mix,
                drop_hold_labels=getattr(cfg.train, "dagger_drop_hold", True),
                drop_timeout_episodes=getattr(cfg.train, "dagger_drop_timeout",
                                              True),
                timeout_keep_every=getattr(cfg.train,
                                           "dagger_timeout_keep_every", 0),
                start_near_frac=getattr(cfg.train, "start_near_frac", 0.0),
            ))

    collect_dagger = _make_collect_dagger(n_dagger) if n_dagger else None
    collect_dagger_late = (
        _make_collect_dagger(n_dagger_late)
        if n_dagger and n_dagger_late != n_dagger else collect_dagger)
    mirror_aug = bool(getattr(cfg.train, "mirror_aug", False))
    batch_kw = dict(
        mirror_aug=mirror_aug,
        goal_boost=float(getattr(cfg.train, "goal_boost", 1.0)),
        goal_window=int(getattr(cfg.train, "goal_window", 20)))
    batch_fn = jax.jit(
        lambda buf, key: make_batch(buf, key, cfg.train.batch_size, cfg.model,
                                    cfg.sim, **batch_kw))

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

    probe = None
    if probe_every > 0:
        from e2e_parking_carla_tpu.train.probe import ClosedLoopProbe

        # 3 poses/slot = 48 attempts covering both headings and the +-8 m
        # sweep extremes; a 1-pose probe only sees the easiest start
        # (alongside the goal) and badly overestimates protocol TSR
        probe = ClosedLoopProbe(model, cfg, parking_nums=3)

    def refresh_buffer(step):
        """New expert fleet + (once the policy has trained) a DAgger slice
        rolled out by the current params with expert labels."""
        key = jax.random.fold_in(k_collect, step)
        buf = collect(key)
        if collect_dagger is not None and step >= cfg.train.dagger_start_step:
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            fn = collect_dagger_late if step >= late_start else collect_dagger
            dbuf = fn(variables, jax.random.fold_in(key, 1))
            buf = concat_buffers(buf, dbuf)
        return buf

    @jax.jit
    def run_chunk(st, buf, key):
        keys = jax.random.split(key, chunk)

        def body(carry, k_i):
            s = carry
            batch = make_batch(buf, k_i, cfg.train.batch_size, cfg.model,
                               cfg.sim, **batch_kw)
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
    next_probe = next_multiple(probe_every)
    while step < total_steps:
        if step >= next_refresh:
            buffer = refresh_buffer(step)
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
            if image_log_dir is not None:
                try:
                    from e2e_parking_carla_tpu.utils.viz import log_prediction_panel
                    log_prediction_panel(model, state, val_batch, cfg.model,
                                         image_log_dir, step)
                except Exception as e:  # viz must never kill a training run
                    log(f"image log failed: {e}")

            if ckpt_manager is not None:
                ckpt_manager.save(step, state, metrics=val_metrics)

        if probe is not None and step >= next_probe:
            next_probe += probe_every * ((step - next_probe) // probe_every + 1)
            variables = {"params": state.ema_params,
                         "batch_stats": state.batch_stats}
            t_p = time.time()
            # late-schedule probes carry the selection decision: boost the
            # seed count once competence emerges (end of the cosine) to cut
            # the binomial share of the adjacent-probe spread
            late = step >= getattr(cfg.train, "probe_late_frac", 0.8) * total_steps
            boost = getattr(cfg.train, "probe_late_seed_boost", 2)
            m = probe(variables, step, export_path=probe_export,
                      seeds=probe.seeds * boost if late else None)
            last_log += time.time() - t_p  # don't count probe time as train
            log(f"step {step}: probe TSR={m['TSR']:.1f} CR={m['CR']:.1f} "
                f"TR={m['TR']:.1f} score={m['probe_score']:.1f} "
                f"(best {probe.best_score:.1f} @ {probe.best_step}) "
                f"[{time.time()-t_p:.0f}s]")

    if probe is not None and probe_export is not None and probe.best_step:
        root, ext = probe_export, ""
        for e in (".msgpack.gz", ".msgpack", ".gz"):
            if probe_export.endswith(e):
                root, ext = probe_export[: -len(e)], e
                break
        soup_path = root + "_soup" + ext
        out = probe.export_soup(soup_path)
        if out is not None:
            m, members = out
            log(f"probe soup ({len(members)} members @ {members}): "
                f"TSR={m['TSR']:.1f} CR={m['CR']:.1f} TR={m['TR']:.1f} "
                f"score={m['probe_score']:.1f} -> {soup_path}")

    return state
