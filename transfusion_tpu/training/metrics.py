"""Observability: structured metrics logging + jax.profiler trace hooks.

The reference's only observability is loguru prints and the LossBreakdown
NamedTuple (SURVEY.md §5.1/§5.5). Here:
  * MetricsLogger — JSONL metrics stream (step, wall time, scalars) with
    in-memory history and simple rate/ewma summaries;
  * ProfilerHook — wraps jax.profiler start/stop around a step window so a
    trainer can capture an XLA trace on demand (view with TensorBoard or
    xprof).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Optional

import jax
import numpy as np


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, ewma: float = 0.98):
        self.path = Path(path) if path else None
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)
            self._fh = open(self.path, "a")
        else:
            self._fh = None
        self.history: list[dict] = []
        self._ewma_coef = ewma
        self._ewma: dict[str, float] = {}
        self._t_last: Optional[float] = None

    def log(self, step: int, metrics: dict, tokens: Optional[int] = None):
        now = time.time()
        row = {"step": int(step), "time": now}
        for k, v in metrics.items():
            v = float(np.asarray(v))
            row[k] = v
            prev = self._ewma.get(k, v)
            self._ewma[k] = prev * self._ewma_coef + v * (1 - self._ewma_coef)

        if self._t_last is not None:
            row["step_seconds"] = now - self._t_last
            if tokens is not None:
                row["tokens_per_sec"] = tokens / max(row["step_seconds"], 1e-9)
        self._t_last = now

        self.history.append(row)
        if self._fh:
            self._fh.write(json.dumps(row) + "\n")
            self._fh.flush()
        return row

    def ewma(self, key: str) -> Optional[float]:
        return self._ewma.get(key)

    def close(self):
        if self._fh:
            self._fh.close()


class ProfilerHook:
    """Capture a jax.profiler trace for steps [start, start+num)."""

    def __init__(self, logdir: str, start_step: int = 10, num_steps: int = 3):
        self.logdir = logdir
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False

    def __call__(self, step: int):
        if step == self.start_step and not self._active:
            jax.profiler.start_trace(self.logdir)
            self._active = True
        elif step >= self.stop_step and self._active:
            jax.profiler.stop_trace()
            self._active = False
