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
                 pallas_partitioned: bool = False,
                 qk_dim: int | None = None, v_dim: int | None = None):
        """``downsample=False`` disables the 4x K/V pooling (full-token
        keys/values — the non-downsampled non-local block variant).
        ``pallas_partitioned`` marks the module as running inside a
        GSPMD-partitioned (model-parallel) program, routing the fused
        kernel through its batch-dim custom_partitioning wrappers.

        ``qk_dim``/``v_dim`` override the reference's fixed c/8 query-key
        and c/2 value widths (layers.py:89-99).  TPU-first extension: the
        MXU contracts over 128 lanes regardless, so at SAGAN scales the
        reference's qk width (e.g. d=2 at church64's 64-channel map)
        leaves the systolic array almost entirely idle — widening toward
        128 adds model capacity at near-zero step-time cost (measured:
        tools/bench_attn_qk.py).  ``None`` keeps exact reference parity."""
        super().__init__()
        if c < 8:
            raise ValueError(f"attention needs >=8 channels, got {c}")
        self.c = c
        # `is None` (not `or`): an explicit 0 must hit the validation
        # below, not silently train at reference widths
        self.qk_dim = c // 8 if qk_dim is None else qk_dim
        self.v_dim = c // 2 if v_dim is None else v_dim
        if self.qk_dim < 1 or self.v_dim < 1:
            raise ValueError(
                f"attention qk_dim/v_dim must be >=1, got "
                f"{self.qk_dim}/{self.v_dim}")
        self.downsample = downsample
        self.dtype = dtype
        self.use_pallas = use_pallas
        self.pallas_partitioned = pallas_partitioned
        kw = dict(kernel=1, stride=1, sn=sn, sn_iters=sn_iters, dtype=dtype)
        self.theta = Conv(c, self.qk_dim, **kw)
        self.phi = Conv(c, self.qk_dim, **kw)
        self.g = Conv(c, self.v_dim, **kw)
        self.out_proj = Conv(self.v_dim, c, **kw)
        self.param_spec("sigma", (), init.zeros)

    def forward(self, cx: Ctx, x):
        b, h, w, c = x.shape
        n = h * w

        q = cx.call(self.theta, x).reshape(b, n, self.qk_dim)
        k = cx.call(self.phi, x)
        v = cx.call(self.g, x)
        if self.downsample:
            k = max_pool(k)
            v = max_pool(v)
        m = k.shape[1] * k.shape[2]
        k = k.reshape(b, m, self.qk_dim)
        v = v.reshape(b, m, self.v_dim)

        o = attention(q, k, v, use_pallas=self.use_pallas,
                      partitioned=self.pallas_partitioned)
        o = o.reshape(b, h, w, self.v_dim)
        o = cx.call(self.out_proj, o)
        return (x + cx.param("sigma") * o).astype(self.dtype)
