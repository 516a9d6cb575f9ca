"""In-training closed-loop probe: checkpoint selection by what actually
matters.

The reference selects checkpoints by open-loop val_loss (trainer/
pl_trainer.py:17-23). Round-1 measurement showed that's selecting noise:
adjacent checkpoints swing 0<->67 TSR while val_loss moves in the third
decimal. Here a small slice of the real eval protocol (one start pose per
slot by default — 16 attempts) runs every few hundred steps on the EMA
weights, and the best-scoring weights are exported as the deploy artifact.

Round-3 additions (VERDICT round-2 item 2 — kill the selection variance):

* **Multi-seed probes**: each probe runs `probe_seeds` independent protocol
  seeds (different NPC scenes) and averages the metrics, halving the
  per-probe selection noise (round-2: adjacent probes swung ~±20 TSR).
* **Probe-winner soup**: the top-K probe snapshots (by score) are kept and
  their parameter AVERAGE is exported alongside the single best — greedy
  argmax over a noisy 48-attempt probe selects noise (round-2: probe-best
  46.9 evaluated to 30.2 on the full protocol), while averaging K
  independently-good EMA iterates from the flat end of the cosine schedule
  is a standard variance reducer (model soup over one trajectory).

Score = TSR - w_cr*CR - 0.5*TR (w_cr = TrainConfig.probe_cr_weight,
default 2): success first, with collisions (the round-1 failure mode:
CR 18% vs the paper's 2%) weighted harder than raw success because the
shipped-artifact gate is TSR >= 75 AND CR <= 5, and timeouts penalized.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import numpy as np

from e2e_parking_carla_tpu.config import Config
from e2e_parking_carla_tpu.eval.evaluator import ClosedLoopEvaluator
from e2e_parking_carla_tpu.sim.env import eval_metrics
from e2e_parking_carla_tpu.train import checkpoints as ckpt_lib


class ClosedLoopProbe:
    """Reusable probe: one compiled rollout, weights swapped per call."""

    def __init__(self, model, cfg: Config, parking_nums: int = 1,
                 sample_variables=None, seeds: Optional[int] = None,
                 top_k: Optional[int] = None):
        probe_eval = dataclasses.replace(
            cfg.eval, epochs=1, parking_nums=parking_nums,
            env_chunk=min(cfg.eval.env_chunk, cfg.eval.task_nums * parking_nums))
        self.cfg = dataclasses.replace(cfg, eval=probe_eval)
        self.ev = ClosedLoopEvaluator(model, sample_variables, self.cfg)
        self.seeds = seeds if seeds is not None else \
            getattr(cfg.train, "probe_seeds", 1)
        self.top_k = top_k if top_k is not None else \
            getattr(cfg.train, "probe_top_k", 5)
        # CR weight in the selection score. The deliverable has a hard
        # CR <= 5 gate next to TSR >= 75, so collisions cost double: a
        # +1 TSR / +1 CR trade is NOT neutral for the shipped artifact.
        self.cr_weight = getattr(cfg.train, "probe_cr_weight", 2.0)
        self.best_score: Optional[float] = None
        self.best_step: Optional[int] = None
        # top-K snapshots as host arrays: list of (score, step, params,
        # batch_stats), kept sorted descending by score
        self._top: list = []

    def _score_current(self, seeds: Optional[int] = None):
        """Average protocol metrics over `seeds` (default `self.seeds`)
        independent scenes with the evaluator's currently-set variables."""
        ms = []
        for s in range(seeds or self.seeds):
            final = self.ev.run_epoch(seed=s)
            ms.append(jax.tree.map(float, eval_metrics(final, self.cfg.eval)))
        m = {k: float(np.mean([d[k] for d in ms])) for k in ms[0]}
        m["probe_score"] = (m["TSR"] - self.cr_weight * m["CR"]
                            - 0.5 * m["TR"])
        return m

    def __call__(self, variables, step: int, export_path: Optional[str] = None,
                 seeds: Optional[int] = None):
        """Run the probe; returns its metric dict (plus 'probe_score').
        If export_path is given and the score improves, the weights are
        written there as a portable artifact; the top-K soup average is
        refreshed at `<export_path stem>_soup<ext>` on every new entry.
        `seeds` overrides the per-probe seed count — the train loop doubles
        it late in the schedule, where competence emerges and selection
        actually happens (adjacent-probe spread is the selection noise)."""
        self.ev.set_variables(variables)
        m = self._score_current(seeds)
        score = m["probe_score"]

        # snapshot to host ONLY when the score makes the top-K: device_get
        # of a full weight set is tens of seconds over a tunneled backend
        if len(self._top) < self.top_k or score > self._top[-1][0]:
            host = (jax.device_get(variables["params"]),
                    jax.device_get(variables.get("batch_stats", {})))
            self._top.append((score, step, host[0], host[1]))
            self._top.sort(key=lambda t: -t[0])
            del self._top[self.top_k:]

        if self.best_score is None or score > self.best_score:
            self.best_score = score
            self.best_step = step
            if export_path is not None:
                os.makedirs(os.path.dirname(os.path.abspath(export_path)),
                            exist_ok=True)
                ckpt_lib.save_weights_artifact(
                    export_path, variables["params"],
                    variables.get("batch_stats", {}), step=step)
        return m

    # ------------------------------------------------------------------
    def soup_variables(self, step_window: int = 6000):
        """Parameter average of the top-K probe snapshots within
        `step_window` steps of the best one (batch stats from the best
        snapshot — BN statistics drift slowly and averaging them across
        distant steps is not obviously meaningful). Measured (30k b0 run):
        an unwindowed soup spanning steps 16k..30k scored 16.1 where its
        best member alone scored 40.6 — averaging weights from distant
        points of the trajectory is NOT a variance reducer, only averaging
        adjacent late-schedule iterates is. Returns None if no probe ran."""
        if not self._top:
            return None
        best_step = self._top[0][1]
        members = [t for t in self._top
                   if abs(t[1] - best_step) <= step_window]
        params = jax.tree.map(
            lambda *xs: np.mean(np.stack(xs, 0), 0).astype(xs[0].dtype),
            *[t[2] for t in members])
        return {"params": params, "batch_stats": self._top[0][3]}

    def export_soup(self, export_path: str):
        """Score the top-K soup with one more probe and write it to
        `export_path`. Returns (metrics, member_steps) or None."""
        soup = self.soup_variables()
        if soup is None:
            return None
        self.ev.set_variables(soup)
        m = self._score_current()
        os.makedirs(os.path.dirname(os.path.abspath(export_path)), exist_ok=True)
        ckpt_lib.save_weights_artifact(export_path, soup["params"],
                                       soup["batch_stats"],
                                       step=self._top[0][1])
        best_step = self._top[0][1]
        return m, [t[1] for t in self._top
                   if abs(t[1] - best_step) <= 6000]
