"""Data-generation CLI (reference: carla_data_gen.py).

    python -m e2e_parking_carla_tpu.cli.datagen --task_num 64 --save_path ./e2e_parking

Runs a vmapped fleet of scripted-expert episodes on device and (optionally)
exports them to the reference's on-disk episode layout (PNG cameras +
measurement JSONs, data_generation/data_generator.py:186-292) for interop
and debugging. Without --save_path the episodes stay in memory and only
summary statistics are printed — on-device training (cli/train.py) needs no
files at all.
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--save_path", default=None,
                   help="export episodes in the reference's disk layout")
    p.add_argument("--task_num", type=int, default=16, help="episodes to generate")
    p.add_argument("--map", default="Town04_Opt", help="kept for CLI parity")
    p.add_argument("--random_seed", type=int, default=0)
    p.add_argument("--shuffle_weather", action="store_true")
    p.add_argument("--smoke", action="store_true", help="CPU-friendly tiny run")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from e2e_parking_carla_tpu.config import Config
    from e2e_parking_carla_tpu.data.rollout import collect_episodes

    cfg = Config()
    n = min(args.task_num, 8) if args.smoke else args.task_num
    buf = jax.jit(
        lambda k: collect_episodes(k, n, cfg.model, cfg.sim, cfg.eval)
    )(jax.random.PRNGKey(args.random_seed))
    buf = jax.block_until_ready(buf)
    succ = int(np.asarray(buf.success).sum())
    frames = int(np.asarray(buf.valid).sum())
    print(f"generated {n} episodes: {succ} successes, {frames} training frames")

    if args.save_path:
        from e2e_parking_carla_tpu.data.export import export_episodes

        out = export_episodes(buf, args.save_path, args.map, cfg,
                              render=not args.smoke)
        print(f"exported to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
