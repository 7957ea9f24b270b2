"""Profiling hooks — a first-class subsystem the reference lacks
entirely (SURVEY.md §5 "Tracing/profiling: none"; its only signal is a
wall-clock print per epoch).

* ``trace(logdir)``: context manager around ``jax.profiler`` —
  TensorBoard-compatible traces (xplane) of device + host activity;
* ``TraceWindow``: trace a [start, stop) step-index window of a training
  loop (the Trainer's ``profile_dir`` hook);
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


class TraceWindow:
    """Trace steps [start, stop) of a loop: call ``step(i)`` with the
    running step index; the trace starts when i reaches ``start`` and
    stops at ``stop``.  ``close()`` (idempotent) stops a still-open
    trace — call it on early exit (preemption).

    ``barrier`` (an attribute the driving loop keeps current) is called
    before opening and closing the trace: on this backend dispatch runs
    up to 300× ahead of execution, so without a fetch-forced drain the
    window would delimit *dispatch* indices and capture an arbitrary
    slice of device activity instead of the named steps.  The trainer
    sets it to a device_get of the newest dispatched call's metrics."""

    def __init__(self, logdir: str, start: int = 10, stop: int = 20,
                 barrier=None):
        self.logdir = logdir
        self.start, self.stop = start, stop
        self.barrier = barrier
        self._active = False

    def step(self, i: int) -> None:
        if i == self.start and not self._active:
            if self.barrier is not None:
                self.barrier()   # drain: steps < start are off the trace
            jax.profiler.start_trace(self.logdir)
            self._active = True
        elif i >= self.stop and self._active:
            # >= : a loop that skips past stop (steps_per_call strides,
            # resume skips) must still close the window
            self.close()

    def close(self) -> None:
        if self._active:
            if self.barrier is not None:
                self.barrier()   # drain: steps [start, stop) have RUN
            jax.profiler.stop_trace()
            self._active = False


class StepTimer:
    """Rolling wall-clock step statistics from fetch-to-fetch deltas.

    On this backend dispatch runs asynchronously far ahead of execution
    (CLAUDE.md: ``block_until_ready`` is not a barrier), so ticking after
    every *dispatched* call would measure dispatch rate — up to 300x
    optimistic.  Instead, call ``tick(steps)`` only at true
    synchronization points (a metric ``device_get``), passing the number
    of steps executed since the previous tick; the recorded per-step
    time then reflects real execution.  ``start()`` arms the timer
    without recording (use it after warmup/compile)."""

    def __init__(self, window: int = 100):
        self.window = window
        self._times: list[float] = []
        self._last = None

    def start(self) -> None:
        self._last = time.perf_counter()

    def tick(self, steps: int = 1) -> None:
        now = time.perf_counter()
        if self._last is not None and steps > 0:
            self._times.append((now - self._last) / steps)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    def mean_ms(self) -> float:
        if not self._times:
            return 0.0
        return 1000.0 * sum(self._times) / len(self._times)
