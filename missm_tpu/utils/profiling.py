"""Tracing + step-time observability.

The reference has no profiling beyond tqdm bars (SURVEY §5). Here:
- `trace(logdir)`: a context manager around jax.profiler.trace — produces
  Perfetto/TensorBoard-viewable device traces.
- `StepTimer`: host-side step/input accounting with a duty-cycle estimate
  (fraction of wall time the device step occupied vs input stalls) — the
  north-star meter for the >90% input-bound target (BASELINE.md).
"""
from __future__ import annotations

import contextlib
import time
from typing import List


@contextlib.contextmanager
def trace(logdir: str):
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self.step_times: List[float] = []
        self.input_times: List[float] = []
        self._t = None

    def input_start(self):
        self._t = time.perf_counter()

    def input_end(self):
        if self._t is not None:
            self.input_times.append(time.perf_counter() - self._t)
        self._t = time.perf_counter()

    def step_end(self):
        if self._t is not None:
            self.step_times.append(time.perf_counter() - self._t)
        self._t = None

    @property
    def duty_cycle(self) -> float:
        total = sum(self.step_times) + sum(self.input_times)
        if total == 0:
            return 0.0
        return sum(self.step_times) / total

    def summary(self) -> dict:
        import numpy as np
        st = np.asarray(self.step_times or [0.0])
        it = np.asarray(self.input_times or [0.0])
        return {
            "steps": len(self.step_times),
            "step_ms_mean": float(st.mean() * 1000),
            "step_ms_p50": float(np.percentile(st, 50) * 1000),
            "input_ms_mean": float(it.mean() * 1000),
            "duty_cycle": self.duty_cycle,
        }
