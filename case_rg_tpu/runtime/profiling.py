"""Profiling and step-metric observability.

The reference's only observability is a loss print every 100 batches
(common/CumulativeTrainer.py:113-120). Here:

* ``trace(logdir)`` — context manager around ``jax.profiler`` for device
  traces viewable in TensorBoard/XProf;
* ``StepMeter`` — host-side throughput/latency meter with EMA smoothing;
* ``MetricsLogger`` — JSONL per-step metric log (loss components, lr,
  step time), cheap enough to leave on.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    if not logdir:
        yield
        return
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepMeter:
    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg_s: Optional[float] = None
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.time()

    def stop(self) -> float:
        dt = time.time() - self._t0
        self.avg_s = dt if self.avg_s is None else (
            self.ema * self.avg_s + (1 - self.ema) * dt)
        return dt

    def steps_per_sec(self) -> float:
        return 1.0 / self.avg_s if self.avg_s else 0.0


class MetricsLogger:
    def __init__(self, path: Optional[str]):
        self.f = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self.f = open(path, "a", buffering=1)

    def log(self, step: int, metrics: Dict[str, float]):
        if self.f is None:
            return
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self.f.write(json.dumps(rec) + "\n")

    def close(self):
        if self.f:
            self.f.close()
            self.f = None
