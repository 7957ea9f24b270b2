"""A/B the shipped fused one-pass flash backward after the dq-slab
layout fix (round 4): the slab used to be [B, nk, N, D] fp32 — a Pallas
output's HBM layout is forced major-to-minor, so D = 2 lane-padded to
128 (64x bytes: a 16 GB compile-time OOM at the 512px shape, and ~4 GB
resident + 64x write traffic silently carried at 256px).  Now emitted
transposed, [B, nk, D, N] (D sublane-pads 2 -> 8 only).

Anchor: the UNCHANGED two-kernel backward, same process (CLAUDE.md:
cross-process numbers are +/-30% noisy; the adopted-era in-process
ratio was fused 135.7 ms vs two-kernel 213.4 ms at this shape, so the
fix's effect shows as a better fused:two-kernel ratio).

MEASURED (v5e, this round):
two-kernel 212.34 ms; fused (transposed slab) 114.77 ms — ratio 0.540
vs the pre-fix 0.636 (135.7/213.4): the layout fix is worth a further
~15% of the fused backward at the 256px training shape, on top of
fitting the 512px B=4 step that the padded slab OOMed.  Numerics vs
the two-kernel path: max|Δ| dq/dk/dv = 9.8e-4/3.9e-3/2.0e-3 (bf16
accumulation-order only).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sagan_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sagan_tpu.ops.pallas_attention import (  # noqa: E402
    _flash_bwd, _flash_bwd_fused, _flash_fwd, _pick_flash_blocks,
    _pick_flash_blocks_bwd_fused, _pick_flash_blocks_fwd)
from sagan_tpu.utils.timing import timeit_best  # noqa: E402

B, N, M, D, C = 16, 65536, 16384, 2, 8
DT = jnp.bfloat16


def main():
    from sagan_tpu.utils.device import wait_for_devices

    dev = wait_for_devices(log_every=30.0)[0]
    print(f"device: {dev.device_kind}  shape B={B} N={N} M={M} d={D} c={C}")

    key = jax.random.PRNGKey(0)
    kq, kk, kv, kg = jax.random.split(key, 4)
    q = jax.random.normal(kq, (B, N, D), DT)
    k = jax.random.normal(kk, (B, M, D), DT)
    v = jax.random.normal(kv, (B, M, C), DT)
    g = jax.random.normal(kg, (B, N, C), DT)

    bn, bm = _pick_flash_blocks(N, M, D, C)
    fwd_bn, fwd_bm = _pick_flash_blocks_fwd(N, M, D, C)
    fbn, fbm = _pick_flash_blocks_bwd_fused(N, M, D, C)
    print(f"blocks: two-kernel ({bn},{bm})  fused ({fbn},{fbm})")

    o, lse = jax.jit(
        lambda q, k, v: _flash_fwd(q, k, v, fwd_bn, fwd_bm, 1))(q, k, v)

    ref = jax.jit(lambda *a: _flash_bwd(*a, bn, bm, 1))(q, k, v, o, lse, g)
    out = jax.jit(lambda *a: _flash_bwd_fused(*a, fbn, fbm))(
        q, k, v, o, lse, g)
    for a, r, nm in zip(out, ref, "qkv"):
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - r.astype(jnp.float32))))
        print(f"  max|Δd{nm}| fused vs two-kernel: {err:.2e}")

    t2 = timeit_best(lambda *a: _flash_bwd(*a, bn, bm, 1),
                     q, k, v, o, lse, g, iters=5)
    tf = timeit_best(lambda *a: _flash_bwd_fused(*a, fbn, fbm),
                     q, k, v, o, lse, g, iters=5)
    print(f"two-kernel backward: {t2 * 1e3:8.2f} ms")
    print(f"fused (transposed slab): {tf * 1e3:8.2f} ms  "
          f"ratio {tf / t2:.3f} (pre-fix in-process ratio 0.636)")


if __name__ == "__main__":
    main()
