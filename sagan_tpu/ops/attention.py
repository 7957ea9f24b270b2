"""SAGAN self-attention core op: ``softmax(Q Kᵀ) V`` over flattened
feature-map tokens.

Replaces the reference's two ``tf.matmul`` + ``tf.nn.softmax`` sequence
(/root/reference/layers.py:108-116) with a single dispatchable op that has
two interchangeable backends:

* ``attention_reference`` — straight-line einsum/softmax (the test oracle
  and the CPU fallback);
* ``attention_fused`` — a Pallas TPU kernel (``pallas_attention.py``) that
  streams Q row-blocks through VMEM and never materializes the
  [N, M] probability matrix in HBM.

Semantics (per original SAGAN, arXiv:1805.08318): logits are **unscaled**
(no 1/sqrt(d) — the learnable output gate ``sigma`` starts at 0 and takes
that role), softmax over the key axis.  K/V are typically 4×-downsampled
by the caller (stride-2 max-pool), so M = N/4.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def attention_reference(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Unfused oracle.

    Args:
      q: [B, N, D] queries (theta path).
      k: [B, M, D] keys (phi path, possibly downsampled).
      v: [B, M, C] values (g path, same M as keys).
    Returns:
      [B, N, C] attention output in q.dtype.
    """
    from .util import matmul_precision

    prec = matmul_precision(q.dtype)
    logits = jnp.einsum("bnd,bmd->bnm", q, k,
                        preferred_element_type=jnp.float32,
                        precision=prec)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bnm,bmc->bnc", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32,
                     precision=prec)
    return out.astype(q.dtype)


# -- site-shape recording (benchmark FLOP accounting) ----------------------
#
# bench.py cross-checks XLA's compiled FLOP count (which includes the
# Pallas kernels only via their pl.CostEstimate declarations) against an
# analytic attention count.  The (N, M, D, C) of every attention site a
# model forward visits is captured here at trace time — architecture
# arithmetic (which ladder stage a site lands on, its channel width)
# stays in ONE place, the model code itself.
_SITE_RECORD: list | None = None


class record_attention_sites:
    """Context manager: collects one (n, m, d, c) tuple per attention()
    call traced inside the block (use with jax.eval_shape — no FLOPs are
    spent).  Not reentrant; trace-time only."""

    def __enter__(self):
        global _SITE_RECORD
        self.sites: list[tuple[int, int, int, int]] = []
        _SITE_RECORD = self.sites
        return self.sites

    def __exit__(self, *exc):
        global _SITE_RECORD
        _SITE_RECORD = None
        return False


@functools.lru_cache(maxsize=1)
def _pallas_available() -> bool:
    try:
        import jax.experimental.pallas  # noqa: F401
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def attention(q: jax.Array, k: jax.Array, v: jax.Array,
              use_pallas: bool | None = None,
              partitioned: bool = False) -> jax.Array:
    """Dispatch to the fused Pallas kernel on TPU, einsum elsewhere.

    ``use_pallas=None`` auto-selects; True/False force a backend.
    ``partitioned=True`` routes through the batch-dim
    ``custom_partitioning`` wrappers so the kernels stay enabled inside
    GSPMD-partitioned (model-parallel) programs; on a non-TPU platform
    that path runs the kernels in interpret mode (how the virtual-mesh
    tests exercise it).
    """
    if _SITE_RECORD is not None:
        _SITE_RECORD.append((q.shape[1], k.shape[1], q.shape[2],
                             v.shape[2]))
    if use_pallas is None:
        use_pallas = _pallas_available() and q.shape[1] >= 256
    if use_pallas:
        if partitioned:
            from .pallas_attention import attention_fused_partitioned
            interpret = jax.devices()[0].platform != "tpu"
            return attention_fused_partitioned(q, k, v, interpret=interpret)
        from .pallas_attention import attention_fused
        return attention_fused(q, k, v)
    return attention_reference(q, k, v)
