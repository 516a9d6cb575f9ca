"""Evaluate several weight sets from one training run on the full protocol,
sharing ONE compiled rollout (the evaluator takes variables as an argument,
so weight swaps are free).

    python tools/eval_checkpoint_variants.py --ckpt ckpt/exp_... \
        --config config/training_b0.yaml --out_prefix eva_result_b0_r2

Writes `<out_prefix>_raw/` (final SGD iterate) and `<out_prefix>_ema/`
(final EMA weights) CSV trees and prints both metric rows.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--config", default="config/training_b0.yaml")
    p.add_argument("--out_prefix", default="eva_result")
    p.add_argument("--epochs", type=int, default=4)
    args = p.parse_args(argv)

    import jax

    from e2e_parking_carla_tpu.config import load_config
    from e2e_parking_carla_tpu.data.rollout import collect_episodes, make_batch
    from e2e_parking_carla_tpu.eval import ClosedLoopEvaluator
    from e2e_parking_carla_tpu.models import ParkingModel
    from e2e_parking_carla_tpu.train import checkpoints as ckpt_lib
    from e2e_parking_carla_tpu.train import trainer as trainer_lib

    cfg = load_config(args.config)
    model = ParkingModel(cfg.model, cfg.sim)
    buf = jax.jit(lambda k: collect_episodes(k, 2, cfg.model, cfg.sim, cfg.eval))(
        jax.random.PRNGKey(0))
    sample = jax.jit(lambda b, k: make_batch(b, k, 2, cfg.model, cfg.sim))(
        buf, jax.random.PRNGKey(1))
    skeleton = trainer_lib.create_train_state(
        model, cfg, jax.random.PRNGKey(0), sample)
    mngr = ckpt_lib.CheckpointManager(args.ckpt)
    state = mngr.restore(skeleton, step=mngr.latest_step())
    print(f"restored step {int(state.step)}", flush=True)

    ev = ClosedLoopEvaluator(model, None, cfg)
    for name, params in (("raw", state.params), ("ema", state.ema_params)):
        ev.set_variables({"params": params, "batch_stats": state.batch_stats})
        overall, _ = ev.run(out_dir=f"{args.out_prefix}_{name}",
                            epochs=args.epochs)
        print(f"[{name}] " + " ".join(f"{k}={v:.2f}" for k, v in overall.items()),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
