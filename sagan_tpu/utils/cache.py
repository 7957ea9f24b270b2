"""Persistent XLA compilation cache.

TPU compiles on this infrastructure go through a remote-compile tunnel
at ~40-300s per program; the persistent cache makes every process after
the first start in seconds.  Called by the CLIs, bench, and the driver
entry points; safe to call multiple times, must run before the first
compilation.
"""

from __future__ import annotations

import os


def enable_compilation_cache(directory: str | None = None) -> str | None:
    if os.environ.get("SAGAN_TPU_NO_COMPILE_CACHE"):
        return None
    import jax

    directory = directory or os.environ.get(
        "SAGAN_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "sagan_tpu_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", directory)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None
    return directory
