"""Test harness: force an 8-virtual-device CPU platform *before* JAX
initializes, so multi-chip sharding/collective paths are exercised without
TPU hardware (the reference has no multi-device tests at all —
SURVEY.md §4)."""

import os
import sys

# Overwrite (not setdefault): the outer environment pins JAX_PLATFORMS to
# the real TPU; tests must run on the virtual-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config knob
# does take effect as long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"
assert len(jax.devices()) >= 8, "expected 8 virtual CPU devices"
