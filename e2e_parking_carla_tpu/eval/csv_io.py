"""CSV artifacts for closed-loop evaluation.

Mirrors the reference's outputs: a per-epoch per-slot CSV
(`{epoch}_result.csv`, network_evaluator.py:450-476) and mean/std summaries
across epochs (`result_mean.csv`/`result_std.csv`, network_evaluator.py:
478-518; the std uses the reference's sigma/sqrt(6) convention from
tool/metric.py:25-40).
"""

from __future__ import annotations

import csv
import os
from typing import List

import numpy as np

from e2e_parking_carla_tpu.config import EvalConfig
from e2e_parking_carla_tpu.sim import scene as scene_lib
from e2e_parking_carla_tpu.sim.env import Status

SLOT_METRICS = ("TSR", "TFR", "NTSR", "NTFR", "CR", "OR", "TR", "APE", "AOE", "APT", "AIT")


def per_slot_metrics(final_states, eval_cfg: EvalConfig, ait: float):
    """(n_slots, metrics) rows from a 96-attempt epoch (attempt-major order
    slot0 x parking_nums, slot1 x parking_nums, ...)."""
    status = np.asarray(final_states.status).reshape(
        eval_cfg.task_nums, eval_cfg.parking_nums)
    pos = np.asarray(final_states.final_pos_err).reshape(status.shape)
    ori = np.asarray(final_states.final_orient_err).reshape(status.shape)
    tim = np.asarray(final_states.final_time).reshape(status.shape)

    rows = []
    n = float(eval_cfg.parking_nums)
    for s in range(eval_cfg.task_nums):
        st = status[s]
        ts = st == Status.TARGET_SUCCESS
        row = {
            "slot_id": scene_lib.EVAL_SLOT_IDS[s],
            "TSR": 100.0 * ts.sum() / n,
            "TFR": 100.0 * (st == Status.TARGET_FAIL).sum() / n,
            "NTSR": 100.0 * (st == Status.NO_TARGET_SUCCESS).sum() / n,
            "NTFR": 100.0 * (st == Status.NO_TARGET_FAIL).sum() / n,
            "CR": 100.0 * (st == Status.COLLISION).sum() / n,
            "OR": 100.0 * (st == Status.OUTBOUND).sum() / n,
            "TR": 100.0 * (st == Status.TIMEOUT).sum() / n,
            "APE": float(pos[s][ts].mean()) if ts.any() else float("nan"),
            "AOE": float(ori[s][ts].mean()) if ts.any() else float("nan"),
            "APT": float(tim[s][ts].mean()) if ts.any() else float("nan"),
            "AIT": ait * 1000.0,
        }
        rows.append(row)
    return rows


def write_epoch_csv(out_dir: str, epoch: int, final_states,
                    eval_cfg: EvalConfig, ait: float) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{epoch + 1}_result.csv")
    rows = per_slot_metrics(final_states, eval_cfg, ait)
    with open(path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["slot_id", *SLOT_METRICS])
        writer.writeheader()
        writer.writerows(rows)
    return path


STATUS_NAMES = {
    Status.RUNNING: "running", Status.TARGET_SUCCESS: "target_success",
    Status.TARGET_FAIL: "target_fail",
    Status.NO_TARGET_SUCCESS: "no_target_success",
    Status.NO_TARGET_FAIL: "no_target_fail", Status.COLLISION: "collision",
    Status.OUTBOUND: "outbound", Status.TIMEOUT: "timeout",
}


def write_attempt_csv(out_dir: str, epoch: int, final_states,
                      eval_cfg: EvalConfig) -> str:
    """Per-attempt breakdown (beyond the reference's per-slot CSVs): one row
    per (slot, start pose) with the terminal status and final errors — the
    raw material for failure analysis (which poses time out, where the
    collisions concentrate)."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{epoch + 1}_attempts.csv")
    shape = (eval_cfg.task_nums, eval_cfg.parking_nums)
    status = np.asarray(final_states.status).reshape(shape)
    pos = np.asarray(final_states.final_pos_err).reshape(shape)
    ori = np.asarray(final_states.final_orient_err).reshape(shape)
    tim = np.asarray(final_states.final_time).reshape(shape)
    from e2e_parking_carla_tpu.sim import scene as scene_lib
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=[
            "slot_id", "pose_idx", "status", "pos_err_m", "orient_err_deg",
            "time_s"])
        w.writeheader()
        for s in range(shape[0]):
            for p in range(shape[1]):
                w.writerow({
                    "slot_id": scene_lib.EVAL_SLOT_IDS[s], "pose_idx": p,
                    "status": STATUS_NAMES.get(int(status[s, p]),
                                               str(int(status[s, p]))),
                    "pos_err_m": round(float(pos[s, p]), 3),
                    "orient_err_deg": round(float(ori[s, p]), 2),
                    "time_s": round(float(tim[s, p]), 1)})
    return path


def write_mean_std_csv(out_dir: str, per_epoch_metrics: List[dict]) -> tuple:
    """Across-epoch mean and sigma/sqrt(6) files (tool/metric.py:25-47)."""
    os.makedirs(out_dir, exist_ok=True)
    keys = [k for k in per_epoch_metrics[0] if k != "slot_id"]
    mean_path = os.path.join(out_dir, "result_mean.csv")
    std_path = os.path.join(out_dir, "result_std.csv")
    with open(mean_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        w.writerow({k: np.mean([m[k] for m in per_epoch_metrics]) for k in keys})
    with open(std_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        w.writerow({
            k: np.std([m[k] for m in per_epoch_metrics]) / np.sqrt(6.0) for k in keys
        })
    return mean_path, std_path


def aggregate_result_csvs(result_dir: str, out_dir: str | None = None):
    """Offline aggregator over `*_result.csv` files — the tool/metric.py
    CLI equivalent: per-slot mean and sigma/sqrt(6) across epochs."""
    import glob

    out_dir = out_dir or result_dir
    files = sorted(glob.glob(os.path.join(result_dir, "*_result.csv")))
    if not files:
        raise FileNotFoundError(f"no *_result.csv under {result_dir}")
    epochs = []
    for path in files:
        with open(path) as f:
            epochs.append(list(csv.DictReader(f)))
    slot_ids = [r["slot_id"] for r in epochs[0]]
    keys = [k for k in epochs[0][0].keys() if k != "slot_id"]

    def to_rows(fn):
        rows = []
        for i, slot in enumerate(slot_ids):
            row = {"slot_id": slot}
            for k in keys:
                vals = np.array([float(e[i][k]) for e in epochs])
                row[k] = fn(vals)
            rows.append(row)
        return rows

    mean_path = os.path.join(out_dir, "result_mean.csv")
    std_path = os.path.join(out_dir, "result_std.csv")
    for path, fn in ((mean_path, np.nanmean),
                     (std_path, lambda v: np.nanstd(v) / np.sqrt(6.0))):
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["slot_id", *keys])
            w.writeheader()
            w.writerows(to_rows(fn))
    return mean_path, std_path
