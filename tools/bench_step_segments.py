"""Where does the train step's time go?  Two decompositions:

1. **Differential** (church64, the headline config): rebuild the full
   train step with one component toggled off and compare ms/step.
   Measured on a real v5e (2026-08-17):

     full                 7.33 ms/step     einsum attention  17.34
     no attention         1.11             unfused D          7.47
     only 32x32 G attn    2.04             fp32              29.52
     no per-var summaries 7.30

   => attention is ~85% of the step (the 64x64 layer alone ~5.3 ms);
   everything else is already minor.  See tools/bench_attn_floor.py for
   why that 85% is at the machine floor.

2. **Segment** (imagenet128 paper-scale gf64): jit G/D forward and
   backward separately with XLA-counted FLOPs:

     g_fwd   9.76 ms  718 GFLOP  73.7 TFLOP/s (37% MFU)
     g_grad 29.02 ms 2146 GFLOP  73.9 TFLOP/s (37%)
     d_fwd   7.79 ms  641 GFLOP  82.3 TFLOP/s (42%)
     d_grad 19.01 ms 1904 GFLOP 100.2 TFLOP/s (51%)

   The generator trails the discriminator by ~14 MFU points; per
   tools/bench_convt_alternatives.py that is NOT the transposed convs
   (XLA's dilated lowering beats tap-exact reformulations), leaving the
   conditional-BN bandwidth passes between convs and the skinny
   first/last layers as the structural difference (D has no
   normalization layers at all — reference parity).

Hot-path provenance: the step being decomposed is the reference's
update-ratio D loop + G update (/root/reference/sagan/main.py:175-205),
ranked the hot region in SURVEY.md §3.2.

Run: python tools/bench_step_segments.py [church64|gf64]
(one real-TPU process at a time; first run compiles each variant).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sagan_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

import bench
from sagan_tpu.models import get_discriminator, get_generator
from sagan_tpu.utils.timing import timeit_best

# the measured configs come from bench.py (one source of truth for the
# benchmark configs and the fetch-forced measurement discipline)
CHURCH64 = dict(bench.CHURCH64, compute_dtype="bfloat16",
                use_pallas=None, steps_per_call=8)
GF64 = dict(bench.IMAGENET128, gf_dim=64, df_dim=64,
            compute_dtype="bfloat16")


def _measure_step(config, name):
    rate = bench.measure(*bench.build(config))   # steps/sec, fetch-forced
    print(f"{name:28s}: {1000.0 / rate:7.3f} ms/step", flush=True)
    return rate


def differential_church64():
    _measure_step(CHURCH64, "full")
    _measure_step(dict(CHURCH64, use_attention=False), "no attention")
    _measure_step(dict(CHURCH64, attn_dim_G=[32]), "no 64x64 G attn")
    _measure_step(dict(CHURCH64, summary_var=False), "no per-var summaries")
    _measure_step(dict(CHURCH64, fuse_d_batches=False), "unfused D")
    _measure_step(dict(CHURCH64, use_pallas=False), "einsum attention")
    _measure_step(dict(CHURCH64, compute_dtype="float32"), "fp32")


def segments_gf64():
    config, B = GF64, 64
    gen = get_generator(config)
    disc = get_discriminator(config)
    key = jax.random.PRNGKey(0)
    vg = gen.init(key)
    vd = disc.init(jax.random.fold_in(key, 1))
    z = jax.random.normal(jax.random.fold_in(key, 2), (B, 128))
    labels = jnp.zeros((B,), jnp.int32)
    imgs = jax.random.normal(jax.random.fold_in(key, 3), (B, 128, 128, 3),
                             jnp.bfloat16)
    imgs2 = jnp.concatenate([imgs, imgs], 0)
    labels2 = jnp.concatenate([labels, labels], 0)

    def g_fwd(vg, z, labels):
        out, _ = gen(vg, z, labels, train=True)
        return jnp.sum(out.astype(jnp.float32))

    def g_grad(vg, z, labels):
        return jax.grad(lambda p: g_fwd({"params": p, "aux": vg["aux"]},
                                        z, labels))(vg["params"])

    def d_fwd(vd, x, labels):
        out, _ = disc(vd, x, labels, train=True)
        return jnp.sum(out.astype(jnp.float32))

    def d_grad(vd, x, labels):
        return jax.grad(lambda p: d_fwd({"params": p, "aux": vd["aux"]},
                                        x, labels))(vd["params"])

    def timeit(fn, *args, iters=10):
        j = jax.jit(fn)
        best = timeit_best(j, *args, iters=iters, jit=False)
        c = j.lower(*args).compile().cost_analysis()
        c = c[0] if isinstance(c, (list, tuple)) else c
        fl = float(c.get("flops", 0))
        print(f"{fn.__name__:8s}: {best*1e3:8.3f} ms  {fl/1e9:8.1f} GFLOP  "
              f"{fl/best/1e12:6.1f} TFLOP/s "
              f"({fl/best/1e12/197*100:5.1f}% of v5e bf16 peak)", flush=True)

    timeit(g_fwd, vg, z, labels)
    timeit(g_grad, vg, z, labels)
    timeit(d_fwd, vd, imgs2, labels2)
    timeit(d_grad, vd, imgs2, labels2)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "church64"
    if which == "gf64":
        segments_gf64()
    else:
        differential_church64()
