"""Manual driving CLI (reference: carla_data_gen.py's pygame loop +
keyboard_control.py + hud.py).

    python -m e2e_parking_carla_tpu.cli.teleop --target 2-2

W/S throttle/brake, A/D steer, Q toggle reverse, Backspace reset, Esc quit.
Requires a display (or SDL_VIDEODRIVER=dummy for a headless dry run).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--target", default="2-2", help="slot id, e.g. 2-2")
    p.add_argument("--random_seed", type=int, default=0)
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--smoke", action="store_true", help="CPU + dummy display")
    args = p.parse_args(argv)

    import os

    import jax
    if args.smoke:
        os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
        jax.config.update("jax_platforms", "cpu")

    from e2e_parking_carla_tpu.config import Config
    from e2e_parking_carla_tpu.sim import scene as scene_lib
    from e2e_parking_carla_tpu.utils.teleop import run_teleop

    cfg = Config()
    target_idx = scene_lib.SLOT_IDS.index(args.target)
    done = run_teleop(cfg, target_idx=target_idx, seed=args.random_seed,
                      max_frames=args.max_frames or (90 if args.smoke else None))
    print(f"completed episodes: {done}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
