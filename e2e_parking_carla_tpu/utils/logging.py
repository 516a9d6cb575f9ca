"""Metric + message logging.

Replaces the reference's stack of loguru sinks (pl_train.py:33-36), stdlib
logging (carla_data_gen.py:125-126), and TensorBoard `log_dict`
(pl_trainer.py:79,110) with one `MetricLogger`: JSONL on disk always (easy
to parse, append-only, crash-safe), TensorBoard scalars when the package is
importable, stderr echo optional.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Mapping


class MetricLogger:
    def __init__(self, log_dir: str, echo: bool = True, tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self.echo = echo
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter  # cpu torch is baked in

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: Mapping[str, float], prefix: str = ""):
        payload = {"step": int(step), "time": time.time()}
        for key, value in metrics.items():
            name = f"{prefix}{key}"
            payload[name] = float(value)
            if self._tb is not None:
                self._tb.add_scalar(name, float(value), int(step))
        self._jsonl.write(json.dumps(payload) + "\n")
        self._jsonl.flush()
        if self.echo:
            body = " ".join(f"{k}={v:.4f}" for k, v in payload.items()
                            if k not in ("step", "time"))
            print(f"[step {step}] {body}", file=sys.stderr)

    def message(self, text: str):
        if self.echo:
            print(text, file=sys.stderr)
        self._jsonl.write(json.dumps({"time": time.time(), "msg": text}) + "\n")
        self._jsonl.flush()

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
