"""Training CLI (reference: pl_train.py).

    python -m e2e_parking_carla_tpu.cli.train --config config/training.yaml
    python -m e2e_parking_carla_tpu.cli.train --smoke   # tiny CPU check

Unlike the reference (disk dataset + 8 dataloader workers + optional DDP),
training data is generated on device by the scripted expert and the whole
step — collection, rendering, fwd/bwd, Adam — is one XLA program per step.
"""

from __future__ import annotations

import argparse
import dataclasses


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None,
                   help="YAML config (accepts the reference training.yaml schema)")
    p.add_argument("--steps", type=int, default=None,
                   help="total train steps (default: epochs * steps_per_epoch)")
    p.add_argument("--steps_per_epoch", type=int, default=200)
    p.add_argument("--n_envs", type=int, default=256,
                   help="expert rollout fleet size per collection")
    p.add_argument("--refresh_every", type=int, default=500)
    p.add_argument("--chunk", type=int, default=25,
                   help="fused train steps per device dispatch")
    p.add_argument("--val_every", type=int, default=200)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--model_axis", type=int, default=1,
                   help="tensor-parallel axis size (1 = pure data parallel)")
    p.add_argument("--resume", default=None,
                   help="checkpoint dir to resume from (restores the latest "
                        "step and continues; the reference has no resume "
                        "wiring, SURVEY §5)")
    p.add_argument("--init_from", default=None,
                   help="weights artifact (.msgpack.gz) to warm-start from: "
                        "every leaf whose path+shape matches transfers, the "
                        "rest keep their fresh init (our analog of the "
                        "reference's ImageNet-pretrained trunk, "
                        "cam_encoder.py:17 — e.g. seed a b4 run with the b0 "
                        "flagship's BEV/fusion/decoder weights)")
    p.add_argument("--init_skip", default="cam_encoder",
                   help="comma-separated param-path prefixes excluded from "
                        "--init_from transfer (default: the camera trunk)")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax debug_nans (fail fast on NaNs)")
    p.add_argument("--smoke", action="store_true",
                   help="tiny model + few steps, CPU-friendly")
    p.add_argument("--probe_every", type=int, default=0,
                   help="closed-loop probe interval in steps (0 disables); "
                        "the best EMA weights by probe score are exported")
    p.add_argument("--probe_export", default=None,
                   help="path for the best-probe weights artifact "
                        "(default: <ckpt_dir>/best_ema.msgpack.gz)")
    p.add_argument("--image_log_dir", default=None,
                   help="write GT-vs-predicted seg/depth panels here at "
                        "every val (reference pl_trainer.py:123-168)")
    p.add_argument("--dagger_frac", type=float, default=None,
                   help="override TrainConfig.dagger_envs_frac (0 = pure BC)")
    p.add_argument("--dagger_mix", type=float, default=None,
                   help="override TrainConfig.dagger_expert_mix")
    p.add_argument("--dagger_start", type=int, default=None,
                   help="override TrainConfig.dagger_start_step")
    p.add_argument("--near_frac", type=float, default=None,
                   help="override TrainConfig.start_near_frac (fraction of "
                        "collection episodes starting in the near band)")
    p.add_argument("--dagger_timeout_keep", type=int, default=None,
                   help="override TrainConfig.dagger_timeout_keep_every "
                        "(keep every Nth frame of DAgger timeout episodes; "
                        "0 = drop them entirely)")
    p.add_argument("--dagger_late_boost", type=float, default=None,
                   help="override TrainConfig.dagger_late_boost (multiply "
                        "the DAgger slice by this past dagger_late_frac of "
                        "the schedule; CR-targeted late correction)")
    p.add_argument("--dagger_late_frac", type=float, default=None,
                   help="override TrainConfig.dagger_late_frac")
    p.add_argument("--mirror_aug", action="store_const", const=True,
                   default=None,
                   help="enable TrainConfig.mirror_aug (reflect half of "
                        "each batch across the ego's longitudinal axis; "
                        "exact for the symmetric camera rig)")
    p.add_argument("--ema_decay", type=float, default=None,
                   help="override TrainConfig.ema_decay (0 disables EMA)")
    p.add_argument("--dart_steer", type=float, default=None,
                   help="override TrainConfig.dart_steer_sigma (DART "
                        "noise-injected expert collection; 0 disables)")
    p.add_argument("--dart_accel", type=float, default=None,
                   help="override TrainConfig.dart_accel_sigma")
    p.add_argument("--goal_boost", type=float, default=None,
                   help="override TrainConfig.goal_boost (sampling weight "
                        "of the last goal_window frames of each episode; "
                        "terminal-precision lever, 1.0 disables)")
    p.add_argument("--goal_window", type=int, default=None,
                   help="override TrainConfig.goal_window")
    return p.parse_args(argv)


# (CLI flag, TrainConfig field) pairs applied when the flag is given —
# every quality lever is overridable per run without editing YAML
_TRAIN_OVERRIDES = (
    ("dagger_frac", "dagger_envs_frac"),
    ("dagger_mix", "dagger_expert_mix"),
    ("dagger_start", "dagger_start_step"),
    ("near_frac", "start_near_frac"),
    ("dagger_timeout_keep", "dagger_timeout_keep_every"),
    ("dagger_late_boost", "dagger_late_boost"),
    ("dagger_late_frac", "dagger_late_frac"),
    ("mirror_aug", "mirror_aug"),
    ("ema_decay", "ema_decay"),
    ("dart_steer", "dart_steer_sigma"),
    ("dart_accel", "dart_accel_sigma"),
    ("goal_boost", "goal_boost"),
    ("goal_window", "goal_window"),
)


def apply_train_overrides(cfg, args):
    """Fold non-None CLI lever flags into cfg.train."""
    updates = {field: getattr(args, flag)
               for flag, field in _TRAIN_OVERRIDES
               if getattr(args, flag) is not None}
    if not updates:
        return cfg
    return dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, **updates))


def main(argv=None):
    args = parse_args(argv)

    import jax
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    from e2e_parking_carla_tpu.config import Config, ModelConfig, SimConfig, load_config
    from e2e_parking_carla_tpu.models import ParkingModel
    from e2e_parking_carla_tpu.train import checkpoints as ckpt_lib
    from e2e_parking_carla_tpu.train.loop import train_loop

    cfg = load_config(args.config) if args.config else Config()
    cfg = apply_train_overrides(cfg, args)
    if args.smoke:
        tiny = dataclasses.replace(
            ModelConfig(), backbone="efficientnet-b0", image_crop=32,
            final_dim=(32, 32), bev_x_bound=(-10.0, 10.0, 0.4),
            bev_y_bound=(-10.0, 10.0, 0.4), d_bound=(0.5, 12.5, 2.0),
            bev_encoder_resize=64,
            tf_en_layers=1, tf_de_layers=1, tf_en_ffn_dim=64,
            tf_de_ffn_dim=64, compute_dtype="float32")
        cfg = dataclasses.replace(
            cfg, model=tiny, sim=SimConfig(cam_width=32, cam_height=32),
            train=dataclasses.replace(cfg.train, batch_size=4, epochs=2))
        total_steps = args.steps or 20
        n_envs = min(args.n_envs, 8)
        val_every = min(args.val_every, 10)
        chunk = min(args.chunk, 2)
    else:
        total_steps = args.steps or cfg.train.epochs * args.steps_per_epoch
        n_envs = args.n_envs
        val_every = args.val_every
        chunk = args.chunk

    model = ParkingModel(cfg.model, cfg.sim)
    exp_dir = args.resume or ckpt_lib.experiment_dir(cfg.train.checkpoint_dir)
    mngr = ckpt_lib.CheckpointManager(exp_dir, keep_top_k=cfg.train.keep_top_k)
    print(f"devices: {jax.devices()}")
    print(f"checkpoints -> {exp_dir}")

    state = None
    if (args.resume and mngr.latest_step() is not None) or args.init_from:
        from e2e_parking_carla_tpu.data.rollout import collect_episodes, make_batch
        from e2e_parking_carla_tpu.train import trainer as trainer_lib

        buf = jax.jit(lambda k: collect_episodes(k, 2, cfg.model, cfg.sim, cfg.eval))(
            jax.random.PRNGKey(0))
        sample = jax.jit(lambda b, k: make_batch(b, k, cfg.train.batch_size,
                                                 cfg.model, cfg.sim))(
            buf, jax.random.PRNGKey(1))
        skeleton = trainer_lib.create_train_state(
            model, cfg, jax.random.PRNGKey(0), sample)
        if args.resume and mngr.latest_step() is not None:
            state = mngr.restore(skeleton)
            print(f"resumed from step {int(state.step)}")
        else:
            skip = tuple(p for p in args.init_skip.split(",") if p)
            merged, n_copied, n_skipped = ckpt_lib.merge_weights_artifact(
                args.init_from,
                {"params": skeleton.params, "batch_stats": skeleton.batch_stats},
                skip_prefixes=skip)
            state = skeleton.replace(
                params=merged["params"], batch_stats=merged["batch_stats"],
                ema_params=merged["params"])
            print(f"warm-started from {args.init_from}: "
                  f"{n_copied} leaves transferred, {n_skipped} fresh "
                  f"(skip={skip})")

    import os
    probe_export = args.probe_export or os.path.join(exp_dir, "best_ema.msgpack.gz")
    state = train_loop(
        model, cfg, total_steps=total_steps, n_envs=n_envs,
        refresh_every=args.refresh_every, val_every=val_every,
        chunk=chunk, seed=args.seed, ckpt_manager=mngr, state=state,
        probe_every=args.probe_every, probe_export=probe_export,
        image_log_dir=args.image_log_dir)
    mngr.wait()
    print(f"done: step={int(state.step)} best_ckpt_step={mngr.best_step()}")
    mngr.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
