"""Profiling: wall-clock section timers + jax.profiler traces.

Replaces the reference's observability: PyTorch-Lightning's
`Trainer(profiler='simple')` per-hook wall-clock table (pl_train.py:52) and
the hand-rolled `time.time()` AIT measurement around model.predict
(agent/parking_agent.py:383-388). `SimpleProfiler` reproduces the former;
`trace()` wraps `jax.profiler` for real device timelines (the thing the
reference never had).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


class SimpleProfiler:
    """Accumulates wall-clock per named section; prints a summary table."""

    def __init__(self):
        self._total: Dict[str, float] = defaultdict(float)
        self._count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, block: bool = False) -> Iterator[None]:
        """Time a section. block=True inserts a device fence after the body
        (otherwise async dispatch makes the numbers meaningless)."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block:
                try:
                    jax.effects_barrier()
                except Exception:
                    pass
            dt = time.perf_counter() - t0
            self._total[name] += dt
            self._count[name] += 1

    def summary(self) -> str:
        lines = [f"{'section':<30} {'calls':>8} {'total s':>10} {'mean ms':>10}"]
        for name in sorted(self._total, key=self._total.get, reverse=True):
            t, n = self._total[name], self._count[name]
            lines.append(f"{name:<30} {n:>8} {t:>10.2f} {t / n * 1000:>10.2f}")
        return "\n".join(lines)

    def reset(self):
        self._total.clear()
        self._count.clear()


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block_timed(fn, *args, **kwargs):
    """(result, seconds) with a block_until_ready fence."""
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args, **kwargs))
    return out, time.perf_counter() - t0
