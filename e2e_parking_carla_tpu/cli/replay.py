"""Episode replay CLI: render an expert episode to a GIF.

    python -m e2e_parking_carla_tpu.cli.replay --out episode.gif --episode 0

The host-visualization equivalent of the reference's spectator camera +
episode video (data_generation/sensors.py:40-135) and HUD overlays.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="episode.gif")
    p.add_argument("--episode", type=int, default=0)
    p.add_argument("--n_envs", type=int, default=4)
    p.add_argument("--random_seed", type=int, default=0)
    p.add_argument("--smoke", action="store_true", help="run on CPU")
    args = p.parse_args(argv)

    import jax
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    from e2e_parking_carla_tpu.config import Config
    from e2e_parking_carla_tpu.data.rollout import collect_episodes
    from e2e_parking_carla_tpu.utils.viz import replay_episode

    cfg = Config()
    buf = jax.jit(lambda k: collect_episodes(
        k, args.n_envs, cfg.model, cfg.sim, cfg.eval))(
            jax.random.PRNGKey(args.random_seed))
    path = replay_episode(buf, args.episode, cfg, args.out)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
