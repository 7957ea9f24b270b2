"""Profiling utils coverage."""

import time

from sagan_tpu.utils.profiling import StepTimer, trace


def test_step_timer_rolling_mean():
    t = StepTimer(window=3)
    assert t.mean_ms() == 0.0
    for _ in range(5):
        t.tick()
        time.sleep(0.01)
    assert 5.0 < t.mean_ms() < 100.0
    assert len(t._times) == 3  # window respected


def test_trace_context_writes_profile(tmp_path):
    import jax
    import jax.numpy as jnp

    d = str(tmp_path / "prof")
    with trace(d):
        jnp.ones((8, 8)).sum().block_until_ready()
    import os
    found = []
    for root, _dirs, files in os.walk(d):
        found.extend(files)
    assert found, "no profiler artifacts written"
