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
    for the driver's one JSON line).

    Acquisition retries to the deadline: ``jax.devices()`` blocking
    inside the backend's claim-retry loop is the common wedge, but a
    *raising* probe (e.g. a transient tunnel error) is retried too —
    a single early exception must not burn the whole budget
    (BENCH_r03.json lesson: the one failure mode left unretried is the
    one that fires)."""
    import jax

    if timeout is None:
        t = os.environ.get("SAGAN_DEVICE_TIMEOUT_S")
        timeout = float(t) if t else None

    t0 = time.time()

    def remaining():
        return None if timeout is None else timeout - (time.time() - t0)

    # A BLOCKING probe (the stale-lease wedge) may wait unbounded when
    # timeout is None — training jobs should survive a busy pool.  A
    # RAISING probe is different: transient tunnel errors deserve a few
    # retries, but a permanent init failure (broken plugin install, bad
    # credentials) must surface, not loop "retrying in 15s" forever on
    # an unattended box.  Cap consecutive raising probes when unbounded.
    max_raising = int(os.environ.get("SAGAN_DEVICE_MAX_PROBE_ERRORS", "40"))
    attempt = 0
    while True:
        attempt += 1
        result = _probe_devices(log_every, t0, timeout, stream)
        if not isinstance(result, Exception):
            return result
        left = remaining()
        if left is not None and left <= 15.0:
            raise result
        if left is None and attempt >= max_raising:
            print(f"device probe failed {attempt} consecutive times — "
                  "treating as a permanent init failure", flush=True,
                  file=stream)
            raise result
        print(f"device probe attempt {attempt} failed ({result!r}) — "
              "retrying in 15s", flush=True, file=stream)
        time.sleep(15.0)
        _reset_backend_cache()


def _probe_devices(log_every, t0, timeout, stream):
    """One ``jax.devices()`` call in a daemon thread with heartbeat;
    returns the device list, or the exception it raised.  Raises
    ``TimeoutError`` when the deadline passes while the probe is still
    blocked (the stale-lease wedge — the thread is left to die with the
    process; the claim loop holds no local state worth unwinding)."""
    import jax

    box: list = []

    def probe():
        try:
            box.append(jax.devices())
        except Exception as e:  # surfaced to the caller below
            box.append(e)

    th = threading.Thread(target=probe, daemon=True)
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
    return box[0]


def _reset_backend_cache():
    """Best-effort: clear jax's cached backend-init failure so a retry
    actually re-probes instead of replaying the cached exception.
    Everything in here is defensive — a missing/renamed internal must
    never kill the acquisition retry loop (an eagerly-evaluated
    ``jax.extend`` attribute lookup did exactly that once)."""
    try:
        import jax.extend.backend as _jeb

        _jeb.clear_backends()
        return
    except Exception:
        pass
    try:
        import jax

        jax.clear_backends()
    except Exception:
        pass
