"""On-TPU Pallas kernel parity check: fused vs oracle, NON-interpret.

The pytest suite verifies the Pallas kernels in interpreter mode on CPU;
Mosaic compilation is a different execution path (layouts, padding,
accumulation order), so this script runs the same comparisons natively on
the real chip for the shapes the models actually use and records
max|fused − oracle| for forward and gradients into ``PARITY_TPU.json``.

Kernel contracts being checked (reference semantics):
  * attention_fused  — softmax(QKᵀ)V, unscaled logits
    (/root/reference/layers.py:108-116);
  * spectral_normalize_fused — n-step power iteration + W/σ
    (/root/reference/layers.py:50-68, with the never-applied division
    fixed).

Usage:  python tools/pallas_parity.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sagan_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def _err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    denom = max(1e-12, float(np.abs(b).max()))
    return float(np.abs(a - b).max()), float(np.abs(a - b).max() / denom)


def attention_cases():
    """(N, M, d, c) for every attention insertion the example configs can
    request: church64 vanilla gf16 @32/@64, imagenet128 resnet @32/@64,
    and the 128px-map non-downsampled worst case."""
    return [
        ("church64_attn32", 4, 1024, 256, 4, 16),
        ("church64_attn64", 4, 4096, 1024, 2, 8),
        ("imagenet128_attn32", 4, 1024, 256, 8, 32),
        ("imagenet128_attn64", 4, 4096, 1024, 4, 16),
        ("map128_full_tokens", 1, 16384, 4096, 8, 32),
    ]


def check_attention(results, dtype, tol_fwd, tol_bwd):
    from sagan_tpu.ops.attention import attention_reference
    from sagan_tpu.ops.pallas_attention import attention_fused

    for name, b, n, m, d, c in attention_cases():
        # deterministic per-case seed: Python's str hash is salted
        # per process, which would make the committed artifact (and
        # near-tolerance pass/fail) vary run to run
        import zlib
        key = jax.random.PRNGKey(zlib.crc32(name.encode()) % 2**31)
        kq, kk, kv, kg = jax.random.split(key, 4)
        q = jax.random.normal(kq, (b, n, d), dtype)
        k = jax.random.normal(kk, (b, m, d), dtype)
        v = jax.random.normal(kv, (b, m, c), dtype)
        ct = jax.random.normal(kg, (b, n, c), dtype)

        fused = jax.jit(attention_fused)
        oracle = jax.jit(attention_reference)
        out_f = jax.device_get(fused(q, k, v))
        out_o = jax.device_get(oracle(q.astype(jnp.float32),
                                      k.astype(jnp.float32),
                                      v.astype(jnp.float32)))
        abs_f, rel_f = _err(out_f, out_o)

        def loss_fused(q, k, v):
            return jnp.sum(attention_fused(q, k, v) * ct)

        def loss_oracle(q, k, v):
            return jnp.sum(attention_reference(
                q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32)) * ct.astype(jnp.float32))

        gf = jax.device_get(jax.jit(jax.grad(loss_fused, (0, 1, 2)))(q, k, v))
        go = jax.device_get(jax.jit(jax.grad(loss_oracle, (0, 1, 2)))(q, k, v))
        grads = {}
        ok = rel_f <= tol_fwd
        for nm, a, bb in zip("qkv", gf, go):
            ab, rel = _err(a, bb)
            grads[f"d{nm}_max_abs"] = ab
            grads[f"d{nm}_max_rel"] = rel
            ok = ok and rel <= tol_bwd
        results.append({
            "kernel": "attention_fused", "case": name,
            "dtype": str(np.dtype(dtype)), "shape": [b, n, m, d, c],
            "fwd_max_abs": abs_f, "fwd_max_rel": rel_f,
            **grads, "tol_fwd": tol_fwd, "tol_bwd": tol_bwd, "ok": bool(ok),
        })
        print(f"attention {name} {np.dtype(dtype)}: fwd_rel={rel_f:.2e} "
              f"ok={ok}", flush=True)


def check_flash(results, dtype, tol_fwd, tol_bwd):
    """The key-axis-blocked (flash) kernels, exercised directly at a
    mid-size shape (the dispatch only selects them beyond-VMEM, where
    the einsum oracle itself would be too large to run)."""
    from sagan_tpu.ops.attention import attention_reference
    from sagan_tpu.ops.pallas_attention import _attention_flash

    b, n, m, d, c = 2, 4096, 2048, 8, 32
    bn, bm = 512, 512
    # forward blocks larger than the backward-safe pair (round 4): the
    # split-pick path the real dispatch now takes at flash shapes
    fbn, fbm = 512, 1024
    key = jax.random.PRNGKey(7)
    kq, kk, kv, kg = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, n, d), dtype)
    k = jax.random.normal(kk, (b, m, d), dtype)
    v = jax.random.normal(kv, (b, m, c), dtype)
    ct = jax.random.normal(kg, (b, n, c), dtype)

    out_f = jax.device_get(jax.jit(
        lambda q, k, v: _attention_flash(q, k, v, bn, bm, fbn, fbm, 1,
                                         False))(q, k, v))
    out_o = jax.device_get(jax.jit(attention_reference)(
        q.astype(jnp.float32), k.astype(jnp.float32),
        v.astype(jnp.float32)))
    abs_f, rel_f = _err(out_f, out_o)

    gf = jax.device_get(jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(_attention_flash(q, k, v, bn, bm, fbn, fbm,
                                                 1, False)
                                * ct), (0, 1, 2)))(q, k, v))
    go = jax.device_get(jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(attention_reference(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32)) * ct.astype(jnp.float32)),
        (0, 1, 2)))(q, k, v))
    grads, ok = {}, rel_f <= tol_fwd
    for nm, a, bb in zip("qkv", gf, go):
        ab, rel = _err(a, bb)
        grads[f"d{nm}_max_abs"] = ab
        grads[f"d{nm}_max_rel"] = rel
        ok = ok and rel <= tol_bwd
    results.append({
        "kernel": "attention_flash", "case": f"flash_bn{bn}_bm{bm}",
        "dtype": str(np.dtype(dtype)), "shape": [b, n, m, d, c],
        "fwd_max_abs": abs_f, "fwd_max_rel": rel_f,
        **grads, "tol_fwd": tol_fwd, "tol_bwd": tol_bwd, "ok": bool(ok),
    })
    print(f"attention_flash {np.dtype(dtype)}: fwd_rel={rel_f:.2e} ok={ok}",
          flush=True)


def check_flash_fused_bwd(results, dtype, tol, shape=(4, 65536, 16384, 2, 8),
                          case=None):
    """The fused one-pass backward (round 4) vs the two-kernel backward
    at the REAL 256px shape — the einsum oracle cannot run there
    ([N, M] = 64 GB fp32), so the previously-parity-checked two-kernel
    path is the reference.  Differences are bf16 accumulation-order
    only (dq partial-slab summation vs in-kernel accumulation).

    Also run with VMEM-budget STRESS shapes (see main): the block
    pickers' estimators lane-pad d and c, so every d, c ≤ 128 occupies
    the padded footprint the 256px d=2/c=8 run already proved on
    hardware — but head widths PAST one 128-lane tile (attn_qk_dim /
    attn_v_dim overrides) genuinely grow residency, and compiling +
    running the picker's near-limit choice there is the only evidence
    the ~1 MiB estimate-error headroom holds (Mosaic scoped-VMEM
    failures are compile-time crashes, not catchable fallbacks)."""
    from sagan_tpu.ops.pallas_attention import (_flash_bwd,
                                                _flash_bwd_fused,
                                                _flash_fwd,
                                                _pick_flash_blocks,
                                                _pick_flash_blocks_bwd_fused,
                                                _pick_flash_blocks_fwd)

    b, n, m, d, c = shape
    key = jax.random.PRNGKey(11)
    kq, kk, kv, kg = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, n, d), dtype)
    k = jax.random.normal(kk, (b, m, d), dtype)
    v = jax.random.normal(kv, (b, m, c), dtype)
    ct = jax.random.normal(kg, (b, n, c), dtype)

    fbn, fbm = _pick_flash_blocks_fwd(n, m, d, c)
    o, lse = jax.jit(lambda q, k, v: _flash_fwd(q, k, v, fbn, fbm, 1))(
        q, k, v)
    ubn, ubm = _pick_flash_blocks_bwd_fused(n, m, d, c)
    bn, bm = _pick_flash_blocks(n, m, d, c)
    gf = jax.device_get(jax.jit(
        lambda *a: _flash_bwd_fused(*a, ubn, ubm))(q, k, v, o, lse, ct))
    g2 = jax.device_get(jax.jit(
        lambda *a: _flash_bwd(*a, bn, bm, 1))(q, k, v, o, lse, ct))
    grads, ok = {}, True
    for nm, a, bb in zip("qkv", gf, g2):
        ab, rel = _err(a, bb)
        grads[f"d{nm}_max_abs"] = ab
        grads[f"d{nm}_max_rel"] = rel
        ok = ok and rel <= tol
    label = case or "256px"
    results.append({
        "kernel": "attention_flash_bwd_fused",
        "case": f"{label}_bn{ubn}_bm{ubm}_vs_twokernel",
        "dtype": str(np.dtype(dtype)), "shape": [b, n, m, d, c],
        **grads, "tol_bwd": tol, "ok": bool(ok),
    })
    print(f"attention_flash_bwd_fused {label} {np.dtype(dtype)}: "
          f"blocks=({ubn},{ubm}) dq_rel={grads['dq_max_rel']:.2e} ok={ok}",
          flush=True)


def sn_weight_shapes():
    """Every SN weight shape in both model families at the benchmark
    configs (church64 vanilla gf/df 16; imagenet128 resnet gf/df 64)."""
    from sagan_tpu.models import get_discriminator, get_generator

    configs = [
        {"model": "vanilla", "z_dim": 128, "gf_dim": 16, "df_dim": 16,
         "img_size": 64, "use_attention": True, "attn_dim_G": [32, 64],
         "attn_dim_D": [8, 4], "use_label": False, "num_classes": 1},
        {"model": "resnet", "z_dim": 128, "gf_dim": 64, "df_dim": 64,
         "img_size": 128, "use_attention": True, "attn_dim_G": [32],
         "attn_dim_D": [32], "use_label": True, "use_cond_bn": True,
         "num_classes": 10},
    ]
    shapes = {}
    for cfg in configs:
        for model in (get_generator(cfg), get_discriminator(cfg)):
            for mod in model.iter_modules():
                if getattr(mod, "sn", False):
                    shapes[tuple(mod._pspecs["w"].shape)] = True
    return sorted(shapes, key=lambda s: (len(s), s))


def check_spectral_norm(results, tol):
    from sagan_tpu.ops.pallas_spectral import spectral_normalize_fused
    from sagan_tpu.ops.spectral import spectral_normalize_xla

    for shape in sn_weight_shapes():
        key = jax.random.PRNGKey(sum(shape))
        w = jax.random.normal(key, shape, jnp.float32)
        u = jax.random.normal(jax.random.fold_in(key, 1), (shape[-1],))
        u = u / jnp.linalg.norm(u)
        t = jax.random.normal(jax.random.fold_in(key, 2), shape)

        fused = jax.jit(lambda w, u: spectral_normalize_fused(w, u, n_iter=3))
        ref = jax.jit(lambda w, u: spectral_normalize_xla(w, u, n_iter=3))
        (wf, uf), (wx, ux) = fused(w, u), ref(w, u)
        abs_w, rel_w = _err(wf, wx)
        abs_u, rel_u = _err(uf, ux)

        gf = jax.jit(jax.grad(
            lambda w: jnp.sum(spectral_normalize_fused(w, u, n_iter=3)[0]
                              * t)))(w)
        gx = jax.jit(jax.grad(
            lambda w: jnp.sum(spectral_normalize_xla(w, u, n_iter=3)[0]
                              * t)))(w)
        abs_g, rel_g = _err(gf, gx)
        ok = rel_w <= tol and rel_u <= tol and rel_g <= tol
        results.append({
            "kernel": "spectral_normalize_fused", "case": str(list(shape)),
            "dtype": "float32", "shape": list(shape),
            "fwd_max_abs": abs_w, "fwd_max_rel": rel_w,
            "u_max_rel": rel_u, "dw_max_abs": abs_g, "dw_max_rel": rel_g,
            "tol": tol, "ok": bool(ok),
        })
        print(f"spectral_norm {shape}: w_rel={rel_w:.2e} dw_rel={rel_g:.2e} "
              f"ok={ok}", flush=True)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PARITY_TPU.json"
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)

    results = []
    # fp32: tight; bf16: inputs carry ~3 decimal digits, logits/softmax
    # amplify — 2% relative on the max element is the expected band
    check_attention(results, jnp.float32, tol_fwd=1e-4, tol_bwd=1e-3)
    check_attention(results, jnp.bfloat16, tol_fwd=2e-2, tol_bwd=5e-2)
    check_flash(results, jnp.float32, tol_fwd=1e-4, tol_bwd=1e-3)
    check_flash(results, jnp.bfloat16, tol_fwd=2e-2, tol_bwd=5e-2)
    check_flash_fused_bwd(results, jnp.bfloat16, tol=5e-2)
    # VMEM-budget stress: head widths past one 128-lane tile are the
    # only regime whose footprint differs from the hardware-proven
    # 256px case (the estimators lane-pad d, c ≤ 128 to the identical
    # residency).  d=128/c=256 forces the fused picker down to
    # (256, 2048) at ~10.5 MiB and the forward to its near-limit pick —
    # compile + run + parity here is the evidence the headroom holds
    # where attn_qk_dim/attn_v_dim overrides can actually reach.
    check_flash_fused_bwd(results, jnp.bfloat16, tol=5e-2,
                          shape=(1, 8192, 4096, 128, 256),
                          case="wide_head_d128_c256")
    check_flash_fused_bwd(results, jnp.bfloat16, tol=5e-2,
                          shape=(1, 16384, 16384, 8, 32),
                          case="mid_head_d8_c32")
    check_spectral_norm(results, tol=1e-4)

    payload = {
        "device_kind": dev.device_kind,
        "platform": dev.platform,
        "all_ok": all(r["ok"] for r in results),
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"\nall_ok={payload['all_ok']}  ({len(results)} cases) "
          f"→ {out_path}", flush=True)
    if not payload["all_ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
