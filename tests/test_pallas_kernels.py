"""Pallas kernel vs. einsum-oracle tests (interpreter mode on CPU; the
same kernels compile natively on TPU — exercised by bench.py and
__graft_entry__.entry())."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sagan_tpu.ops.attention import attention_reference
from sagan_tpu.ops.pallas_attention import attention_fused

KEY = jax.random.PRNGKey(0)


def rand_qkv(b=2, n=64, m=16, d=8, c=16, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(KEY, 3)
    q = jax.random.normal(kq, (b, n, d), dtype)
    k = jax.random.normal(kk, (b, m, d), dtype)
    v = jax.random.normal(kv, (b, m, c), dtype)
    return q, k, v


@pytest.mark.parametrize("n,m", [(64, 16), (256, 64), (64, 64)])
def test_fused_forward_matches_reference(n, m):
    q, k, v = rand_qkv(n=n, m=m)
    ref = attention_reference(q, k, v)
    out = attention_fused(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_forward_multiple_query_blocks():
    # force >1 query block per batch: n=256 with block 256? _pick_block
    # picks the largest divisor; use n=2048 -> block 1024, 2 blocks
    q, k, v = rand_qkv(b=1, n=2048, m=32, d=4, c=8)
    ref = attention_reference(q, k, v)
    out = attention_fused(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_backward_matches_reference():
    q, k, v = rand_qkv(b=2, n=128, m=32, d=8, c=8)

    def loss_fused(q, k, v):
        return jnp.sum(attention_fused(q, k, v, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-4,
                                   err_msg=f"d{name} mismatch")


def test_fused_backward_accumulates_over_query_blocks():
    # n large enough for multiple blocks: dk/dv must sum over all of them
    q, k, v = rand_qkv(b=1, n=2048, m=16, d=4, c=4)

    def loss_fused(k, v):
        return jnp.sum(attention_fused(q, k, v, interpret=True) * 0.01)

    def loss_ref(k, v):
        return jnp.sum(attention_reference(q, k, v) * 0.01)

    gf = jax.grad(loss_fused, argnums=(0, 1))(k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1))(k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_fused_bfloat16_inputs():
    q, k, v = rand_qkv(n=64, m=16, dtype=jnp.bfloat16)
    ref = attention_reference(q.astype(jnp.float32), k.astype(jnp.float32),
                              v.astype(jnp.float32))
    out = attention_fused(q, k, v, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=0.05, rtol=0.05)


def test_attention_vmem_guard_covers_model_shapes():
    """The query-block picker must fit every single-pass shape inside
    the VMEM budget AT LANE-PADDED WIDTHS and hand anything larger to
    the flash path — never the einsum fallback.  The estimate must
    count the Mosaic lane padding of the narrow channel dims: ignoring
    it let M=16384 (the 256px G map, d=2) through the single-pass gate
    and OOMed scoped VMEM on hardware (40 MB actual vs 5 MB unpadded
    estimate)."""
    from sagan_tpu.ops.pallas_attention import (VMEM_BUDGET,
                                                _bwd_vmem_bytes,
                                                _flash_vmem_bytes,
                                                _pick_block,
                                                _pick_flash_blocks)

    # single-pass shapes (every attention site of the shipped configs)
    for n, m, d, c in [(1024, 256, 4, 16), (4096, 1024, 2, 8),
                       (4096, 4096, 2, 8), (4096, 1024, 16, 64),
                       (16384, 4096, 8, 32), (64, 16, 32, 128)]:
        bn = _pick_block(n, m, d, c)
        assert bn > 0, (n, m, d, c)
        assert _bwd_vmem_bytes(bn, m, d, c) <= VMEM_BUDGET
    # at M = 16384, padded K/V + dK/dV residency alone (4 x M x 128
    # lanes x 4 B = 33.6 MB) exceeds the budget for ANY query block:
    # the flash path must take over.  Covers the 256px G map
    # (N=65536, M=16384, d=2) that OOMed pre-fix, the non-downsampled
    # 128px map, and non-downsampled 256px maps.
    for n, m, d, c in [(65536, 16384, 2, 8), (16384, 16384, 8, 32),
                       (16384, 16384, 2, 8), (65536, 65536, 16, 64)]:
        assert _pick_block(n, m, d, c) == 0, (n, m, d, c)
        bn, bm = _pick_flash_blocks(n, m, d, c)
        assert bn > 0 and bm > 0, (n, m, d, c)
        assert _flash_vmem_bytes(bn, bm, d, c) <= VMEM_BUDGET


@pytest.mark.parametrize("n,m,bn,bm", [(512, 256, 128, 128),
                                       (256, 512, 256, 128)])
def test_flash_path_matches_reference(n, m, bn, bm):
    """Key-axis-blocked (flash) kernels vs oracle: multiple key blocks,
    multiple query blocks, fwd + all grads."""
    from sagan_tpu.ops.pallas_attention import _attention_flash

    q, k, v = rand_qkv(b=2, n=n, m=m, d=8, c=16)
    ref = attention_reference(q, k, v)
    out = _attention_flash(q, k, v, bn, bm, bn, bm, 1, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    def loss_flash(q, k, v):
        return jnp.sum(_attention_flash(q, k, v, bn, bm, bn, bm, 1,
                                        True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3,
                                   err_msg=f"d{name} mismatch")


def test_flash_path_batch_blocked():
    from sagan_tpu.ops.pallas_attention import _attention_flash

    q, k, v = rand_qkv(b=4, n=256, m=256, d=4, c=8)
    ref = attention_reference(q, k, v)
    out = _attention_flash(q, k, v, 128, 128, 128, 128, 2, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_forward_blocks_larger_than_backward():
    """Round 4: the forward runs at larger blocks than the backward-safe
    pair (tools/bench_attn_floor256.py measured 25% off the floor
    otherwise).  Fwd picker must return the measured-fastest
    (512, 2048) at the 256px shape; fwd+grads must match the oracle
    when fwd and bwd blocks DIFFER; and the fwd pick must succeed at
    every shape the bwd pick gates into the flash path."""
    from sagan_tpu.ops.pallas_attention import (FWD_VMEM_BUDGET,
                                                _attention_flash,
                                                _flash_fwd_vmem_bytes,
                                                _pick_flash_blocks,
                                                _pick_flash_blocks_fwd)

    assert _pick_flash_blocks_fwd(65536, 16384, 2, 8) == (512, 2048)
    for n, m, d, c in [(65536, 16384, 2, 8), (16384, 16384, 8, 32),
                       (16384, 16384, 2, 8), (65536, 65536, 16, 64)]:
        fbn, fbm = _pick_flash_blocks_fwd(n, m, d, c)
        bn, bm = _pick_flash_blocks(n, m, d, c)
        assert fbn > 0 and fbm > 0, (n, m, d, c)
        assert fbn * fbm >= bn * bm, (n, m, d, c)
        assert _flash_fwd_vmem_bytes(fbn, fbm, d, c) <= FWD_VMEM_BUDGET

    # numerics with split picks: fwd at (256, 512), bwd at (128, 256)
    q, k, v = rand_qkv(b=2, n=512, m=512, d=8, c=16)
    ref = attention_reference(q, k, v)
    out = _attention_flash(q, k, v, 128, 256, 256, 512, 1, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    def loss_flash(q, k, v):
        return jnp.sum(_attention_flash(q, k, v, 128, 256, 256, 512, 1,
                                        True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3,
                                   err_msg=f"d{name} mismatch")


def test_flash_fused_backward_matches_reference():
    """Round 4: the fused one-pass backward (one score recompute for
    dQ/dK/dV, dq via per-key-block partial slabs — measured 36% faster
    than the two-kernel backward at the 256px shape,
    tools/bench_attn_bwd256.py).  Picker contract + numerics vs both
    the einsum oracle and the two-kernel backward it replaces."""
    from sagan_tpu.ops.pallas_attention import (
        BWD_FUSED_VMEM_BUDGET, _attention_flash, _flash_bwd,
        _flash_bwd_fused, _flash_bwd_fused_vmem_bytes, _flash_fwd,
        _pick_flash_blocks_bwd_fused)

    # the measured-fastest pair at the 256px G map
    assert _pick_flash_blocks_bwd_fused(65536, 16384, 2, 8) == (512, 2048)
    # within budget at every flash-path shape it accepts
    for n, m, d, c in [(65536, 16384, 2, 8), (16384, 16384, 8, 32),
                       (16384, 16384, 2, 8), (65536, 65536, 16, 64)]:
        bn, bm = _pick_flash_blocks_bwd_fused(n, m, d, c)
        if bn:
            assert _flash_bwd_fused_vmem_bytes(bn, bm, d, c) \
                <= BWD_FUSED_VMEM_BUDGET
    # single-key-block M (nothing to fuse over) and M without a ≥1024
    # divisor fall back to the two-kernel path
    assert _pick_flash_blocks_bwd_fused(512, 1024, 8, 16) == (0, 0)
    assert _pick_flash_blocks_bwd_fused(512, 1536, 8, 16) == (0, 0)

    # fp32 inputs occupy 2x the VMEM of bf16 in the dlog tile, k/v
    # blocks, and q/g/o rows: the picker must scale by the input
    # itemsize (round-4 review fix — 2-byte counting put the fp32
    # 256px footprint at ~17 MB, past the 16 MB/core Mosaic limit).
    # bf16 keeps the hardware-measured (512, 2048); fp32 demotes.
    assert _pick_flash_blocks_bwd_fused(65536, 16384, 2, 8, 4) \
        == (256, 2048)
    for n, m, d, c in [(65536, 16384, 2, 8), (16384, 16384, 8, 32),
                       (16384, 16384, 2, 8), (65536, 65536, 16, 64)]:
        bn, bm = _pick_flash_blocks_bwd_fused(n, m, d, c, 4)
        if bn:
            assert _flash_bwd_fused_vmem_bytes(bn, bm, d, c, 4) \
                <= BWD_FUSED_VMEM_BUDGET

    # numerics at a fused-engaging shape (m=2048 → fused picks
    # (512, 1024), nk=2): grads through the public dispatch vs oracle
    q, k, v = rand_qkv(b=2, n=512, m=2048, d=8, c=16)
    assert _pick_flash_blocks_bwd_fused(512, 2048, 8, 16)[0] > 0

    def loss_flash(q, k, v):
        return jnp.sum(_attention_flash(q, k, v, 128, 256, 256, 512, 1,
                                        True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3,
                                   err_msg=f"d{name} mismatch")

    # and the fused kernel agrees with the two-kernel backward it
    # replaces, given identical forward residuals
    o, lse = _flash_fwd(q, k, v, 256, 512, 1, True)
    ct = jnp.ones_like(o)
    fused = _flash_bwd_fused(q, k, v, o, lse, ct, 128, 1024, True)
    twok = _flash_bwd(q, k, v, o, lse, ct, 128, 256, 1, True)
    for a, b, name in zip(fused, twok, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=f"d{name} fused vs two-kernel")


def test_flash_pickers_cover_512px_map():
    """The 512px G map (N=262,144, M=65,536, d=2, c=8 at gf16) — two
    stages past the reference's largest config — must dispatch to the
    flash path with the fused backward: forward and fused-backward
    pickers both accept it at the measured-best (512, 2048) blocks, and
    the dq partial slab (B=4) stays inside DQ_SLAB_LIMIT.  Exercised on
    hardware by artifacts/flash512_smoke."""
    from sagan_tpu.ops.pallas_attention import (
        DQ_SLAB_LIMIT, _pick_block, _pick_flash_blocks,
        _pick_flash_blocks_bwd_fused, _pick_flash_blocks_fwd)

    n, m, d, c = 512 * 512, 512 * 512 // 4, 2, 8
    assert _pick_block(n, m, d, c) == 0          # not single-pass
    assert _pick_flash_blocks_fwd(n, m, d, c) == (512, 2048)
    assert _pick_flash_blocks(n, m, d, c)[0] > 0  # two-kernel fallback ok
    fbn, fbm = _pick_flash_blocks_bwd_fused(n, m, d, c)
    assert (fbn, fbm) == (512, 2048)
    b = 4
    assert b * (m // fbm) * n * d * 4 <= DQ_SLAB_LIMIT


def test_fused_large_128px_map_matches_reference():
    """N=16384, M=4096 — the 128px attention placement (VERDICT shapes);
    the picker must shrink the query block to fit VMEM and stay exact."""
    q, k, v = rand_qkv(b=1, n=16384, m=4096, d=8, c=4)
    ref = attention_reference(q, k, v)
    out = attention_fused(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)

    def loss_fused(k, v):
        return jnp.sum(attention_fused(q, k, v, interpret=True) * 1e-3)

    def loss_ref(k, v):
        return jnp.sum(attention_reference(q, k, v) * 1e-3)

    gf = jax.grad(loss_fused, argnums=(0, 1))(k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1))(k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_untileable_shape_falls_back():
    q = jax.random.normal(KEY, (1, 15, 4))  # 15 tokens: no block divides
    k = jax.random.normal(KEY, (1, 5, 4))
    v = jax.random.normal(KEY, (1, 5, 4))
    out = attention_fused(q, k, v)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


# ---------------------------------------------------------------------------
# fused spectral-norm kernel
# ---------------------------------------------------------------------------

from sagan_tpu.ops.pallas_spectral import spectral_normalize_fused
from sagan_tpu.ops.spectral import exact_sigma, spectral_normalize_xla


def test_sn_fused_matches_xla_path():
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 16, 24))
    u = jax.random.normal(jax.random.PRNGKey(2), (24,))
    u = u / jnp.linalg.norm(u)
    wb_x, u_x = spectral_normalize_xla(w, u, n_iter=3)
    wb_f, u_f = spectral_normalize_fused(w, u, n_iter=3, interpret=True)
    np.testing.assert_allclose(np.asarray(wb_f), np.asarray(wb_x),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(u_f), np.asarray(u_x), atol=1e-5)


def test_sn_fused_converges_to_unit_sigma():
    w = jax.random.normal(jax.random.PRNGKey(3), (64, 32))
    u = jnp.ones((32,)) / jnp.sqrt(32.0)
    wb, _ = spectral_normalize_fused(w, u, n_iter=30, interpret=True)
    np.testing.assert_allclose(float(exact_sigma(wb)), 1.0, rtol=1e-3)


def test_sn_fused_gradient_matches_xla_path():
    w = jax.random.normal(jax.random.PRNGKey(4), (12, 8))
    u = jnp.ones((8,)) / jnp.sqrt(8.0)
    t = jax.random.normal(jax.random.PRNGKey(5), (12, 8))

    def loss_f(w):
        wb, _ = spectral_normalize_fused(w, u, n_iter=20, interpret=True)
        return jnp.sum(wb * t)

    def loss_x(w):
        wb, _ = spectral_normalize_xla(w, u, n_iter=20)
        return jnp.sum(wb * t)

    gf = jax.grad(loss_f)(w)
    gx = jax.grad(loss_x)(w)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                               atol=1e-4, rtol=1e-3)


def test_sn_backend_dispatch_both_routes():
    """spectral_normalize(backend=...) takes BOTH routes and they agree
    (the pallas route runs the fused kernel in interpreter mode here;
    natively on TPU via tools/pallas_parity.py)."""
    from sagan_tpu.ops import spectral

    w = jax.random.normal(jax.random.PRNGKey(6), (10, 6))
    u = jnp.ones((6,)) / jnp.sqrt(6.0)
    a, ua = spectral.spectral_normalize(w, u, n_iter=3, backend="xla")
    b, ub = spectral.spectral_normalize(w, u, n_iter=3, backend="pallas",
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ua), np.asarray(ub), atol=1e-6)
    with pytest.raises(ValueError, match="backend"):
        spectral.spectral_normalize(w, u, backend="bogus")


def test_model_level_pallas_sn_matches_xla(dtype=jnp.float32):
    """A whole generator with use_pallas_sn routes every SN layer through
    the fused kernel (interpret mode on CPU) and reproduces the XLA-SN
    forward bit-for-bit-ish."""
    from sagan_tpu.models import get_generator

    base = {"model": "vanilla", "z_dim": 8, "gf_dim": 8, "df_dim": 8,
            "img_size": 16, "use_attention": True, "attn_dim_G": [8],
            "attn_dim_D": [], "use_label": False, "num_classes": 1,
            "compute_dtype": "float32"}
    g_xla = get_generator(base)
    g_pal = get_generator(dict(base, use_pallas_sn=True,
                               pallas_interpret=True))
    assert g_pal.stem.sn_backend == "pallas"
    assert g_pal.attn8.theta.sn_backend == "pallas"
    assert not hasattr(g_xla.stem, "sn_backend")

    v = g_xla.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
    labels = jnp.zeros((4,), jnp.int32)
    out_x, aux_x = g_xla(v, z, labels, train=True)
    out_p, aux_p = g_pal(v, z, labels, train=True)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_p),
                               atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(aux_x), jax.tree.leaves(aux_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_every_pallas_call_declares_a_cost_estimate():
    """FLOP-accounting guard (VERDICT r4 item 1): a Pallas kernel is an
    opaque custom call to XLA, so any pallas_call WITHOUT a
    cost_estimate silently vanishes from compiled cost_analysis() and
    every MFU/TFLOP number derived from it becomes an undercount
    artifact (the committed church256 row read 0.2% MFU for a
    bandwidth-floor kernel).  Enforce the invariant structurally so a
    future kernel cannot regress it."""
    import ast
    import inspect

    from sagan_tpu.ops import pallas_attention

    tree = ast.parse(inspect.getsource(pallas_attention))
    calls = [node for node in ast.walk(tree)
             if isinstance(node, ast.Call)
             and isinstance(node.func, ast.Attribute)
             and node.func.attr == "pallas_call"]
    assert len(calls) >= 5  # fwd, batched bwd, flash fwd, dq, dkv, fused
    missing = [c.lineno for c in calls
               if not any(kw.arg == "cost_estimate" for kw in c.keywords)]
    assert not missing, (
        f"pallas_call at ops/pallas_attention.py:{missing} declares no "
        f"cost_estimate — its FLOPs are invisible to cost_analysis()")
