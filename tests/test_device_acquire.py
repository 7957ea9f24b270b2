"""Device-acquisition retry loop (utils/device.py).

Round-4 hardening after BENCH_r03.json (rc=3, parsed=null): acquisition
must retry RAISING probes to the deadline — the real wedge produced a
blocked probe for 25 min, then a raising one, and an uncaught internal
AttributeError in the backend-cache reset killed the retry loop once.
"""

import time

import pytest

from sagan_tpu.utils import device as dev_mod


def test_reset_backend_cache_never_raises():
    # must be safe to call repeatedly mid-session
    dev_mod._reset_backend_cache()
    dev_mod._reset_backend_cache()


def test_wait_for_devices_returns_devices():
    devs = dev_mod.wait_for_devices(log_every=60.0, timeout=30.0)
    assert len(devs) >= 1


def test_wait_for_devices_retries_raising_probe(monkeypatch, capsys):
    calls = {"n": 0}

    def fake_probe(log_every, t0, timeout, stream):
        calls["n"] += 1
        if calls["n"] < 3:
            return RuntimeError("transient tunnel error")
        return ["fake-device"]

    monkeypatch.setattr(dev_mod, "_probe_devices", fake_probe)
    monkeypatch.setattr(dev_mod.time, "sleep", lambda s: None)
    out = dev_mod.wait_for_devices(timeout=300.0)
    assert out == ["fake-device"]
    assert calls["n"] == 3


def test_wait_for_devices_raises_at_deadline(monkeypatch):
    def fake_probe(log_every, probe_t0, timeout, stream):
        return RuntimeError("still down")

    clock = {"t": time.time()}

    def fake_time():
        clock["t"] += 400.0  # each look at the clock burns budget
        return clock["t"]

    monkeypatch.setattr(dev_mod, "_probe_devices", fake_probe)
    monkeypatch.setattr(dev_mod.time, "sleep", lambda s: None)
    monkeypatch.setattr(dev_mod.time, "time", fake_time)
    # the raising probe must surface once the deadline passes, not loop
    with pytest.raises(RuntimeError, match="still down"):
        dev_mod.wait_for_devices(timeout=1000.0)


def test_unbounded_wait_caps_consecutive_raising_probes(monkeypatch):
    """timeout=None must not loop forever on a PERMANENT init failure
    (broken plugin, bad credentials): consecutive raising probes are
    capped (SAGAN_DEVICE_MAX_PROBE_ERRORS) and the error surfaces."""
    calls = {"n": 0}

    def fake_probe(log_every, t0, timeout, stream):
        calls["n"] += 1
        return RuntimeError("permanent init failure")

    monkeypatch.setattr(dev_mod, "_probe_devices", fake_probe)
    monkeypatch.setattr(dev_mod.time, "sleep", lambda s: None)
    monkeypatch.setenv("SAGAN_DEVICE_MAX_PROBE_ERRORS", "5")
    with pytest.raises(RuntimeError, match="permanent init failure"):
        dev_mod.wait_for_devices(timeout=None)
    assert calls["n"] == 5
