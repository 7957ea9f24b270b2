"""Transposed-conv lowering study for the generator's k=4 s=2 blocks.

The generator segment of the paper-scale (gf64) ImageNet-128 step runs
at ~37% MFU vs the discriminator's ~51% (tools: segment timing), and
its FLOPs are dominated by `lax.conv_transpose` (the TPU lowering is an
input-dilated convolution — nominally 4x the useful work on
zero-padded positions).  This script tests two tap-exact alternative
lowerings against XLA's native one at every (H, cin, cout) the gf16 and
gf64 generator ladders use (reference architecture:
/root/reference/sagan/models/generator.py:7-12, models/generator.py:6-21):

  ref   lax.conv_transpose (input-dilated conv, XLA native)
  d2s   polyphase-as-channels: one dense 3x3 conv to 4*cout (the four
        2x2 phase kernels embedded with zero taps) followed by
        depth-to-space — no dilation, MXU-dense shapes, but 9/4 the
        useful FLOPs and a full-output shuffle
  poly  four separate 2x2 phase convs + interleave (exact FLOPs,
        4 dispatches + an interleaving transpose)

Measured on a real v5e (2026-08-17, fetch-forced): **XLA's native
lowering wins at every shape** — d2s runs at 0.54-0.99x fwd / 0.57-0.99x
grad and poly at 0.61-1.56x fwd, 0.69-1.16x grad (wins only where the
timing floor dominates).  XLA evidently does not pay the naive 4x
dilation tax (its dilated-conv kernels skip zero positions), and the
alternatives' depth-to-space / interleave shuffles cost more than they
save.  Conclusion: `nn/layers.py ConvTranspose` keeps the native
lowering; the generator's MFU gap vs D is the conditional-BN bandwidth
passes and skinny first/last layers, not the transposed convs.

Run: python tools/bench_convt_alternatives.py  (one real-TPU process).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sagan_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sagan_tpu.utils.timing import timeit_best


def convt_ref(x, w):
    # w: [4,4,cin,cout] HWIO, matching nn/layers.py ConvTranspose
    return lax.conv_transpose(
        x, jnp.swapaxes(w, 2, 3), strides=(2, 2), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True)


def pack_kernel(w):
    """[4,4,cin,cout] -> [3,3,cin,4*cout] polyphase taps.

    1-D tap identity for the TF-SAME k=4 s=2 transposed conv
    (validated to rel err <= 3e-7 vs lax.conv_transpose below):
      y[2i]   = x[i-1] w[3] + x[i] w[1]
      y[2i+1] = x[i]   w[2] + x[i+1] w[0]
    Shared 3-tap window over x[i-1..i+1]: even phase -> [w3, w1, 0],
    odd phase -> [0, w2, w0]; 2-D is the outer product of the 1-D maps.
    """
    z = jnp.zeros_like(w[0, 0])
    wh = {0: {0: 3, 1: 1}, 1: {1: 2, 2: 0}}  # phase -> window tap -> w idx

    def tap(ph, pw, i, j):
        if i not in wh[ph] or j not in wh[pw]:
            return z
        return w[wh[ph][i], wh[pw][j]]

    phases = []
    for ph in (0, 1):
        for pw in (0, 1):
            k = jnp.stack([jnp.stack([tap(ph, pw, i, j) for j in range(3)],
                                     axis=0) for i in range(3)], axis=0)
            phases.append(k)
    return jnp.concatenate(phases, axis=-1)


def convt_d2s(x, w):
    k4 = pack_kernel(w)
    B, H, W, _ = x.shape
    cout = w.shape[3]
    y = lax.conv_general_dilated(
        x, k4, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(B, H, W, 2, 2, cout)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, cout)


def convt_poly(x, w):
    B, H, W, _ = x.shape
    cout = w.shape[3]
    k_even_h = jnp.stack([w[3], w[1]], axis=0)
    k_odd_h = jnp.stack([w[2], w[0]], axis=0)
    kernels = {
        (0, 0): jnp.stack([k_even_h[:, 3], k_even_h[:, 1]], axis=1),
        (0, 1): jnp.stack([k_even_h[:, 2], k_even_h[:, 0]], axis=1),
        (1, 0): jnp.stack([k_odd_h[:, 3], k_odd_h[:, 1]], axis=1),
        (1, 1): jnp.stack([k_odd_h[:, 2], k_odd_h[:, 0]], axis=1),
    }
    pads = {0: (1, 0), 1: (0, 1)}
    outs = [lax.conv_general_dilated(
        x, kernels[(ph, pw)], window_strides=(1, 1),
        padding=(pads[ph], pads[pw]),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
        for ph in (0, 1) for pw in (0, 1)]
    y = jnp.stack(outs, axis=3).reshape(B, H, W, 2, 2, cout)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, cout)


def timeit(fn, *args, iters=30):
    return timeit_best(fn, *args, iters=iters)


def main():
    rng = np.random.default_rng(0)
    B = 64
    # gf64 imagenet128 ladder, then gf16 (church64 / imagenet128) ladders
    shapes = [(4, 1024, 1024), (8, 1024, 512), (16, 512, 256),
              (32, 256, 128), (64, 128, 64),
              (8, 512, 256), (16, 128, 64), (32, 64, 32), (4, 256, 128)]
    for H, cin, cout in shapes:
        x32 = rng.standard_normal((B, H, H, cin), dtype=np.float32)
        w32 = (rng.standard_normal((4, 4, cin, cout), dtype=np.float32)
               / np.sqrt(16 * cin))
        yr = np.asarray(convt_ref(jnp.asarray(x32), jnp.asarray(w32)))
        for label, fn in (("d2s", convt_d2s), ("poly", convt_poly)):
            ya = np.asarray(fn(jnp.asarray(x32), jnp.asarray(w32)))
            err = np.max(np.abs(yr - ya)) / (np.max(np.abs(yr)) + 1e-9)
            assert err < 1e-5, (label, H, cin, cout, err)
        x = jnp.asarray(x32, jnp.bfloat16)
        w = jnp.asarray(w32, jnp.bfloat16)
        t_ref = timeit(convt_ref, x, w)
        t_d2s = timeit(convt_d2s, x, w)
        t_poly = timeit(convt_poly, x, w)
        g = lambda f: jax.grad(
            lambda x, w: jnp.sum(f(x, w).astype(jnp.float32) ** 2),
            argnums=(0, 1))
        tg_ref = timeit(g(convt_ref), x, w)
        tg_d2s = timeit(g(convt_d2s), x, w)
        tg_poly = timeit(g(convt_poly), x, w)
        print(f"H={H:3d} cin={cin:4d} cout={cout:4d}  "
              f"fwd ref={t_ref*1e3:6.3f} d2s={t_d2s*1e3:6.3f} "
              f"({t_ref/t_d2s:4.2f}x) poly={t_poly*1e3:6.3f} "
              f"({t_ref/t_poly:4.2f}x)  "
              f"grad ref={tg_ref*1e3:6.3f} d2s={tg_d2s*1e3:6.3f} "
              f"({tg_ref/tg_d2s:4.2f}x) poly={tg_poly*1e3:6.3f} "
              f"({tg_ref/tg_poly:4.2f}x)", flush=True)


if __name__ == "__main__":
    main()
