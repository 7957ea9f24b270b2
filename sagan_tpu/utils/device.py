"""Device acquisition with a visible heartbeat.

On the tunneled axon TPU backend, the first ``jax.devices()`` call
blocks inside a claim-retry loop until the remote pool grants the
chip; a stale lease (e.g. left by a SIGKILLed client) can keep it
waiting for over an hour with zero output.  The reference never faced
this (local GPUs enumerate instantly, /root/reference/sagan/main.py:91),
but every CLI here acquires through this helper so a silent hang is
distinguishable from a slow remote compile, and unattended runs can
bound the wait (``SAGAN_DEVICE_TIMEOUT_S``).
"""

from __future__ import annotations

import os
import threading
import time


def wait_for_devices(log_every: float = 60.0, timeout: float | None = None,
                     stream=None):
    """Return ``jax.devices()``, printing a heartbeat while the grant
    is pending.  ``timeout`` (or env ``SAGAN_DEVICE_TIMEOUT_S``) raises
    ``TimeoutError`` instead of waiting forever; default is unbounded
    (training jobs should survive a busy pool).  ``stream`` redirects
    the heartbeat (bench.py sends it to stderr — its stdout is reserved
    for the driver's one JSON line)."""
    import jax

    if timeout is None:
        t = os.environ.get("SAGAN_DEVICE_TIMEOUT_S")
        timeout = float(t) if t else None

    box: list = []

    def probe():
        try:
            box.append(jax.devices())
        except Exception as e:  # surfaced to the caller below
            box.append(e)

    th = threading.Thread(target=probe, daemon=True)
    t0 = time.time()
    th.start()

    def interval():
        # never sleep past the deadline: a timeout shorter than
        # log_every must still fire on time
        if timeout is None:
            return log_every
        return max(0.0, min(log_every, timeout - (time.time() - t0)))

    th.join(interval())
    while th.is_alive():
        waited = time.time() - t0
        if timeout is not None and waited >= timeout:
            raise TimeoutError(
                f"no accelerator granted after {waited:.0f}s — the device "
                "pool may hold a stale lease from a killed process; retry "
                "later (or raise SAGAN_DEVICE_TIMEOUT_S)")
        print(f"waiting for device grant ({waited:.0f}s) — the pool may "
              "be busy or holding a stale lease", flush=True, file=stream)
        th.join(interval())
    if box and isinstance(box[0], Exception):
        raise box[0]
    return box[0]
