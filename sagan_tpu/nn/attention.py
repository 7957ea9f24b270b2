"""SAGAN self-attention (non-local) block as a functional module.

Rebuilds ``Attention_Layer`` (/root/reference/layers.py:71-120) with the
bug fixed: the reference's ``MaxPool2D(2, 1)`` (stride 1) breaks its own
reshape contract (SURVEY.md Appendix A.2); the original SAGAN design — and
this module — uses a stride-2 2×2 max-pool for a 4× key/value downsample
(``location_num // 4``, the commented intent at layers.py:96).

Structure (channels c, tokens N = H·W, M = N/4 when downsampling):
  theta: SN 1×1 conv, c → c/8                 (queries,  [B,N,c/8])
  phi:   SN 1×1 conv, c → c/8, 2×2/2 maxpool  (keys,     [B,M,c/8])
  g:     SN 1×1 conv, c → c/2, 2×2/2 maxpool  (values,   [B,M,c/2])
  o    = softmax(theta·phiᵀ)·g → SN 1×1 conv c/2 → c
  out  = x + sigma·o,  sigma a scalar initialized to 0
         (layers.py:76-79 — attention fades in as sigma is learned).

The QKᵀ-softmax-V core dispatches to the fused Pallas TPU kernel
(ops/pallas_attention.py) for large token counts.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.attention import attention
from . import initializers as init
from .layers import Conv, max_pool
from .module import Ctx, Module


class SelfAttention(Module):
    def __init__(self, c, sn=True, sn_iters=1, downsample=True,
                 dtype=jnp.float32, use_pallas: bool | None = None,
                 pallas_partitioned: bool = False):
        """``downsample=False`` disables the 4x K/V pooling (full-token
        keys/values — the non-downsampled non-local block variant).
        ``pallas_partitioned`` marks the module as running inside a
        GSPMD-partitioned (model-parallel) program, routing the fused
        kernel through its batch-dim custom_partitioning wrappers."""
        super().__init__()
        if c < 8:
            raise ValueError(f"attention needs >=8 channels, got {c}")
        self.c = c
        self.downsample = downsample
        self.dtype = dtype
        self.use_pallas = use_pallas
        self.pallas_partitioned = pallas_partitioned
        kw = dict(kernel=1, stride=1, sn=sn, sn_iters=sn_iters, dtype=dtype)
        self.theta = Conv(c, c // 8, **kw)
        self.phi = Conv(c, c // 8, **kw)
        self.g = Conv(c, c // 2, **kw)
        self.out_proj = Conv(c // 2, c, **kw)
        self.param_spec("sigma", (), init.zeros)

    def forward(self, cx: Ctx, x):
        b, h, w, c = x.shape
        n = h * w

        q = cx.call(self.theta, x).reshape(b, n, c // 8)
        k = cx.call(self.phi, x)
        v = cx.call(self.g, x)
        if self.downsample:
            k = max_pool(k)
            v = max_pool(v)
        m = k.shape[1] * k.shape[2]
        k = k.reshape(b, m, c // 8)
        v = v.reshape(b, m, c // 2)

        o = attention(q, k, v, use_pallas=self.use_pallas,
                      partitioned=self.pallas_partitioned)
        o = o.reshape(b, h, w, c // 2)
        o = cx.call(self.out_proj, o)
        return (x + cx.param("sigma") * o).astype(self.dtype)
