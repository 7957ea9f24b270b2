"""Shared numeric-policy helpers."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def matmul_precision(dtype) -> lax.Precision:
    """Precision for dots/convs at a given compute dtype.

    fp32 inputs get ``HIGHEST`` — some backends (including this TPU
    toolchain's default) silently demote fp32 contractions to bf16
    passes otherwise.  bf16 inputs get ``DEFAULT``: precision flags are
    meaningless for native-bf16 MXU ops, and ``HIGHEST`` + bf16 crashes
    this TPU compiler outright on large contractions.
    """
    return (lax.Precision.HIGHEST if jnp.dtype(dtype) == jnp.float32
            else lax.Precision.DEFAULT)
