"""Closed-loop evaluation CLI (reference: carla_parking_eva.py).

    python -m e2e_parking_carla_tpu.cli.evaluate \
        --model_path ./ckpt/exp_.../  --eva_epochs 4 \
        --eva_result_path ./eva_result

Runs the 16-slot x 6-attempt protocol (vmapped, one scan per epoch) and
writes the reference's CSV artifacts. With --expert the scripted expert is
evaluated instead of a checkpoint (useful as a protocol self-check: the
expert scores TSR 100).
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", default=None, help="orbax checkpoint dir")
    p.add_argument("--weights", default=None,
                   help="portable weights artifact (.msgpack.gz) instead of "
                        "an orbax checkpoint dir")
    p.add_argument("--model_config_path", default=None, help="YAML config")
    p.add_argument("--eva_epochs", type=int, default=4)
    p.add_argument("--eva_task_nums", type=int, default=16)
    p.add_argument("--eva_parking_nums", type=int, default=6)
    p.add_argument("--eva_result_path", default="./eva_result")
    p.add_argument("--random_seed", type=int, default=0)
    p.add_argument("--expert", action="store_true",
                   help="evaluate the scripted expert instead of a model")
    p.add_argument("--ckpt_step", type=int, default=None,
                   help="checkpoint step to evaluate (default: latest)")
    p.add_argument("--ema", action="store_true",
                   help="evaluate the checkpoint's EMA weights (the deploy "
                        "set) instead of the raw SGD iterate")
    p.add_argument("--no_speed_limit", action="store_true",
                   help="ablation: disable the agent speed-limit heuristics")
    p.add_argument("--mirror_ensemble", action="store_true",
                   help="test-time mirror ensembling: decode jointly from "
                        "the observation and its exact ego-axis mirror "
                        "(chirality-balanced by construction, ~2x AIT)")
    p.add_argument("--show_eva_imgs", action="store_true",
                   help="live view (reference carla_parking_eva.py flag): "
                        "run ONE attempt step-by-step with a pygame panel "
                        "of cameras + predicted BEV (GIF fallback when "
                        "headless) instead of the batched protocol")
    p.add_argument("--live_slot", type=int, default=0,
                   help="with --show_eva_imgs: eval-slot index (0..15)")
    p.add_argument("--live_gif", default=None,
                   help="with --show_eva_imgs: write this GIF instead of "
                        "opening a window")
    p.add_argument("--data_shard", action="store_true",
                   help="shard the attempt fleet over all attached devices "
                        "(data axis, shard_map): the multi-chip protocol path")
    p.add_argument("--smoke", action="store_true")
    return p.parse_args(argv)


def _eval_expert(cfg, out_dir, epochs):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from e2e_parking_carla_tpu.eval import csv_io
    from e2e_parking_carla_tpu.sim import scene as scene_lib
    from e2e_parking_carla_tpu.sim.env import eval_metrics, reset_env, step_env
    from e2e_parking_carla_tpu.sim.expert import ExpertState, expert_policy

    eval_cfg, sim_cfg = cfg.eval, cfg.sim
    n = eval_cfg.task_nums * eval_cfg.parking_nums
    per_epoch = []
    for epoch in range(epochs):
        targets = np.repeat(scene_lib.EVAL_GOAL_INDICES[: eval_cfg.task_nums],
                            eval_cfg.parking_nums)
        pidx = np.tile(np.arange(eval_cfg.parking_nums), eval_cfg.task_nums)
        goal_y = scene_lib.SLOT_XY[targets][:, 1]
        xs, ys, yaws = jax.vmap(scene_lib.eval_start_pose, in_axes=(0, 0, None))(
            jnp.asarray(goal_y), jnp.asarray(pidx), eval_cfg.parking_nums)
        keys = jax.random.split(jax.random.PRNGKey(epoch), n)
        states = jax.vmap(reset_env)(keys, jnp.asarray(targets), xs, ys, yaws)
        est = ExpertState.init((n,))

        def body(carry, _):
            s, e = carry
            ctrl, e = jax.vmap(lambda a, b, c: expert_policy(a, b, c, sim_cfg))(
                s.ego, s.scene, e)
            s = jax.vmap(lambda st, c: step_env(st, c, sim_cfg, eval_cfg))(s, ctrl)
            return (s, e), None

        (final, _), _ = jax.jit(lambda c: jax.lax.scan(
            body, c, None, length=eval_cfg.frames_total_needed + 5))((states, est))
        m = jax.tree.map(float, eval_metrics(final, eval_cfg))
        m["AIT"] = 0.0
        per_epoch.append(m)
        csv_io.write_epoch_csv(out_dir, epoch, final, eval_cfg, 0.0)
        print(f"epoch {epoch + 1}: " + " ".join(f"{k}={v:.2f}" for k, v in m.items()))
    csv_io.write_mean_std_csv(out_dir, per_epoch)
    return per_epoch


def main(argv=None):
    args = parse_args(argv)

    import dataclasses
    import jax
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    from e2e_parking_carla_tpu.config import Config, load_config

    cfg = load_config(args.model_config_path) if args.model_config_path else Config()
    cfg = dataclasses.replace(
        cfg, eval=dataclasses.replace(
            cfg.eval, epochs=args.eva_epochs, task_nums=args.eva_task_nums,
            parking_nums=args.eva_parking_nums,
            use_speed_limit=not args.no_speed_limit,
            mirror_ensemble=args.mirror_ensemble))
    if args.smoke:
        # keep the full 30 s per-attempt budget (the maneuver itself takes
        # ~25 s); just shrink the protocol
        cfg = dataclasses.replace(
            cfg, eval=dataclasses.replace(cfg.eval, epochs=1, task_nums=2,
                                          parking_nums=2))

    if args.expert:
        _eval_expert(cfg, args.eva_result_path, cfg.eval.epochs)
        return 0

    if not args.model_path and not args.weights:
        raise SystemExit("--model_path or --weights required (or use --expert)")

    from e2e_parking_carla_tpu.eval import ClosedLoopEvaluator
    from e2e_parking_carla_tpu.models import ParkingModel
    from e2e_parking_carla_tpu.train import checkpoints as ckpt_lib
    from e2e_parking_carla_tpu.data.rollout import collect_episodes, make_batch
    from e2e_parking_carla_tpu.train import trainer as trainer_lib

    model = ParkingModel(cfg.model, cfg.sim)
    # rebuild a state skeleton to restore into
    buf = jax.jit(lambda k: collect_episodes(k, 2, cfg.model, cfg.sim, cfg.eval))(
        jax.random.PRNGKey(0))
    sample = jax.jit(lambda b, k: make_batch(b, k, 2, cfg.model, cfg.sim))(
        buf, jax.random.PRNGKey(1))
    skeleton = trainer_lib.create_train_state(
        model, cfg, jax.random.PRNGKey(0), sample)
    if args.weights:
        if args.ema:
            raise SystemExit(
                "--ema selects the EMA set from a checkpoint dir and has no "
                "effect on a --weights artifact (which is a single fixed "
                "weight set); drop one of the two flags")
        variables = ckpt_lib.load_weights_artifact(
            args.weights, {"params": skeleton.params,
                           "batch_stats": skeleton.batch_stats})
    else:
        mngr = ckpt_lib.CheckpointManager(args.model_path)
        state = mngr.restore(skeleton, step=args.ckpt_step or mngr.latest_step())
        params = state.ema_params if args.ema else state.params
        variables = {"params": params, "batch_stats": state.batch_stats}

    if args.show_eva_imgs:
        from e2e_parking_carla_tpu.eval.live import run_live_eval
        from e2e_parking_carla_tpu.sim import scene as scene_lib
        from e2e_parking_carla_tpu.sim.env import Status

        target = int(scene_lib.EVAL_GOAL_INDICES[args.live_slot
                                                 % len(scene_lib.EVAL_GOAL_INDICES)])
        status = run_live_eval(model, variables, cfg, target_idx=target,
                               seed=args.random_seed, out_gif=args.live_gif)
        names = {v: k for k, v in vars(Status).items() if isinstance(v, int)}
        print(f"live attempt finished: {names.get(status, status)}")
        return 0

    mesh = None
    if args.data_shard:
        from e2e_parking_carla_tpu.parallel import make_mesh
        mesh = make_mesh(data_axis=len(jax.devices()), model_axis=1)
        print(f"sharding the protocol over {len(jax.devices())} devices")
    ev = ClosedLoopEvaluator(model, variables, cfg, mesh=mesh)
    overall, _ = ev.run(out_dir=args.eva_result_path, epochs=cfg.eval.epochs)
    print("overall: " + " ".join(f"{k}={v:.2f}" for k, v in overall.items()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
