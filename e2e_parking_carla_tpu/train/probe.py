"""In-training closed-loop probe: checkpoint selection by what actually
matters.

The reference selects checkpoints by open-loop val_loss (trainer/
pl_trainer.py:17-23). Round-1 measurement showed that's selecting noise:
adjacent checkpoints swing 0<->67 TSR while val_loss moves in the third
decimal. Here a small slice of the real eval protocol (one start pose per
slot by default — 16 attempts) runs every few hundred steps on the EMA
weights, and the best-scoring weights are exported as the deploy artifact.

Score = TSR - CR - 0.5*TR: success first, with collisions (the round-1
failure mode: CR 18% vs the paper's 2%) and timeouts penalized.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax

from e2e_parking_carla_tpu.config import Config
from e2e_parking_carla_tpu.eval.evaluator import ClosedLoopEvaluator
from e2e_parking_carla_tpu.sim.env import eval_metrics
from e2e_parking_carla_tpu.train import checkpoints as ckpt_lib


class ClosedLoopProbe:
    """Reusable probe: one compiled rollout, weights swapped per call."""

    def __init__(self, model, cfg: Config, parking_nums: int = 1,
                 sample_variables=None):
        probe_eval = dataclasses.replace(
            cfg.eval, epochs=1, parking_nums=parking_nums,
            env_chunk=min(cfg.eval.env_chunk, cfg.eval.task_nums * parking_nums))
        self.cfg = dataclasses.replace(cfg, eval=probe_eval)
        self.ev = ClosedLoopEvaluator(model, sample_variables, self.cfg)
        self.best_score: Optional[float] = None
        self.best_step: Optional[int] = None

    def __call__(self, variables, step: int, export_path: Optional[str] = None):
        """Run the probe; returns its metric dict (plus 'probe_score').
        If export_path is given and the score improves, the weights are
        written there as a portable artifact."""
        self.ev.set_variables(variables)
        final = self.ev.run_epoch(seed=0)
        m = jax.tree.map(float, eval_metrics(final, self.cfg.eval))
        m["probe_score"] = m["TSR"] - m["CR"] - 0.5 * m["TR"]
        if self.best_score is None or m["probe_score"] > self.best_score:
            self.best_score = m["probe_score"]
            self.best_step = step
            if export_path is not None:
                os.makedirs(os.path.dirname(os.path.abspath(export_path)),
                            exist_ok=True)
                ckpt_lib.save_weights_artifact(
                    export_path, variables["params"],
                    variables.get("batch_stats", {}), step=step)
        return m
