"""Profiling / tracing helpers (SURVEY.md §5.1 — the reference has none;
this is a deliberate gap-fill, not parity).

- `trace(dir)` context manager wraps jax.profiler.trace for TensorBoard
  ("Perfetto") traces of jitted steps.
- `StepTimer` tracks wall-per-step with warmup skipping and emits
  steps/sec + device-time summaries.
- `annotate(name)` adds named regions (jax.profiler.TraceAnnotation).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    with jax.profiler.trace(log_dir, create_perfetto_link=False):
        yield


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._last: Optional[float] = None
        self._count = 0

    def tick(self):
        now = time.perf_counter()
        self._count += 1
        if self._last is not None and self._count > self.warmup:
            self.times.append(now - self._last)
        self._last = now

    @property
    def steps_per_sec(self) -> float:
        if not self.times:
            return 0.0
        return len(self.times) / sum(self.times)

    def summary(self) -> dict:
        import numpy as np

        if not self.times:
            return {"steps_per_sec": 0.0}
        t = np.array(self.times)
        return {
            "steps_per_sec": float(len(t) / t.sum()),
            "mean_ms": float(t.mean() * 1e3),
            "p50_ms": float(np.percentile(t, 50) * 1e3),
            "p95_ms": float(np.percentile(t, 95) * 1e3),
        }
