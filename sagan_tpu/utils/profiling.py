"""Profiling hooks — a first-class subsystem the reference lacks
entirely (SURVEY.md §5 "Tracing/profiling: none"; its only signal is a
wall-clock print per epoch).

* ``trace(logdir)``: context manager around ``jax.profiler`` —
  TensorBoard-compatible traces (xplane) of device + host activity;
* ``StepTimer``: cheap rolling step-time stats printed without forcing
  device syncs (reads are piggy-backed on the periodic metric fetch).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-clock step statistics."""

    def __init__(self, window: int = 100):
        self.window = window
        self._times: list[float] = []
        self._last = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    def mean_ms(self) -> float:
        if not self._times:
            return 0.0
        return 1000.0 * sum(self._times) / len(self._times)
