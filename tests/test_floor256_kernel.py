"""Interpret-mode numerics guard for the folded-projection mega-kernel
prototyped in tools/bench_attn_floor256.py (VERDICT r3 item 2): feeding
raw features X/X̄ with W = WθWφᵀ and Wg into one flash kernel must equal
project-then-attend.  Validating here (CPU, tiny shapes) means the
queued on-TPU floor study only spends chip time on a known-correct
kernel."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.bench_attn_floor256 import _folded_kernel


def test_folded_projection_kernel_matches_oracle():
    B, N, M, CIN, C, D = 2, 32, 16, 8, 4, 2
    bn, bm = 8, 8

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, CIN)), jnp.float32)
    xb = jnp.asarray(rng.standard_normal((B, M, CIN)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((CIN, D)) * 0.25, jnp.float32)
    wp = jnp.asarray(rng.standard_normal((CIN, D)) * 0.25, jnp.float32)
    wg = jnp.asarray(rng.standard_normal((CIN, C)) * 0.25, jnp.float32)
    w = wt @ wp.T

    nk = M // bm
    folded = pl.pallas_call(
        functools.partial(_folded_kernel, nk=nk),
        grid=(B, N // bn, nk),
        in_specs=[
            pl.BlockSpec((1, bn, CIN), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, CIN), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CIN, CIN), lambda i, j, kk: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CIN, C), lambda i, j, kk: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bn, C), lambda i, j, kk: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, bn, C), jnp.float32),
            pltpu.VMEM((1, bn, 1), jnp.float32),
            pltpu.VMEM((1, bn, 1), jnp.float32),
        ],
        interpret=True,
    )
    o_f = np.asarray(folded(x, xb, w, wg))

    q = np.asarray(x) @ np.asarray(wt)
    k = np.asarray(xb) @ np.asarray(wp)
    v = np.asarray(xb) @ np.asarray(wg)
    s = np.einsum("bnd,bmd->bnm", q, k)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    o_ref = np.einsum("bnm,bmc->bnc", p, v)

    np.testing.assert_allclose(o_f, o_ref, atol=1e-5, rtol=1e-5)
