"""'resnet' SAGAN family — the legacy ImageNet-128 ResNet G/D, repaired.

Rebuilds /root/reference/models/{generator,discriminator}.py (the working
legacy generation) generalized to any 4·2^k image size, and fixes the
broken ``sagan/`` resnet variants the reference gates off
(SURVEY.md Appendix A.6/A.7: ``power`` used before definition; residual
branch clobbering).

Generator block (models/generator.py:6-21), channels m·gf with
m = 2^(power-1-i) per stage (128px: 16,8,4,2,1):
  main:     BN → ReLU → SN-ConvT 3×3/2 → BN → ReLU → SN-Conv 3×3/1
  shortcut: SN-ConvT 3×3/2
Head: BN → ReLU → SN-Conv 3×3 → tanh (models/generator.py:38-41).
Attention where the feature side ∈ attn_dim_G (legacy fixes it at 32,
models/generator.py:34 — configs express that as attn_dim_G=[32]).

Discriminator (models/discriminator.py): Optimized_Block (SN-Conv 3×3/1 →
ReLU → SN-Conv 3×3/2, shortcut SN-Conv 3×3/2) then pre-activation
downsample blocks with channels df·2^i, one final non-downsampling block,
ReLU → spatial sum-pool → SN-Dense(1) + SN-Embedding projection
(conditional) or an SN 1-channel conv map (unconditional).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn.attention import SelfAttention
from ..nn.layers import (BatchNorm, ConditionalBatchNorm, Conv, ConvTranspose,
                         Dense, Embedding, global_sum_pool)
from ..nn.module import Ctx, Module, remat_span
from .vanilla import _power

relu = jax.nn.relu


class ResUpBlock(Module):
    def __init__(self, cin, cout, num_classes=0, dtype=jnp.float32,
                 sn_iters=1):
        super().__init__()
        self.cond = num_classes > 0
        self.dtype = dtype

        def _bn(c):
            return (ConditionalBatchNorm(c, num_classes, dtype=dtype)
                    if self.cond else BatchNorm(c, dtype=dtype))

        self.bn1 = _bn(cin)
        self.convt1 = ConvTranspose(cin, cout, kernel=3, stride=2, sn=True,
                                    sn_iters=sn_iters, dtype=dtype)
        self.bn2 = _bn(cout)
        self.conv2 = Conv(cout, cout, kernel=3, stride=1, sn=True,
                          sn_iters=sn_iters, dtype=dtype)
        self.convt_sc = ConvTranspose(cin, cout, kernel=3, stride=2, sn=True,
                                      sn_iters=sn_iters, dtype=dtype)

    def forward(self, cx: Ctx, x, labels=None):
        bn = (lambda m, h: cx.call(m, h, labels)) if self.cond else \
             (lambda m, h: cx.call(m, h))
        h = relu(bn(self.bn1, x))
        h = cx.call(self.convt1, h)
        h = relu(bn(self.bn2, h))
        h = cx.call(self.conv2, h)
        sc = cx.call(self.convt_sc, x)
        return (h + sc).astype(self.dtype)


class ResDownBlock(Module):
    """Pre-activation residual down block
    (/root/reference/models/discriminator.py:20-37, with the A.7
    branch-clobbering typo fixed)."""

    def __init__(self, cin, cout, downsample=True, dtype=jnp.float32,
                 sn_iters=1):
        super().__init__()
        self.dtype = dtype
        stride = 2 if downsample else 1
        self.conv1 = Conv(cin, cout, kernel=3, stride=1, sn=True,
                          sn_iters=sn_iters, dtype=dtype)
        self.conv2 = Conv(cout, cout, kernel=3, stride=stride, sn=True,
                          sn_iters=sn_iters, dtype=dtype)
        self.conv_sc = Conv(cin, cout, kernel=3, stride=stride, sn=True,
                            sn_iters=sn_iters, dtype=dtype)

    def forward(self, cx: Ctx, x):
        h = cx.call(self.conv1, relu(x))
        h = cx.call(self.conv2, relu(h))
        sc = cx.call(self.conv_sc, relu(x))
        return (h + sc).astype(self.dtype)


class OptimizedBlock(Module):
    """First D block, no pre-activation on the raw image
    (/root/reference/models/discriminator.py:6-18)."""

    def __init__(self, cin, cout, dtype=jnp.float32, sn_iters=1):
        super().__init__()
        self.dtype = dtype
        self.conv1 = Conv(cin, cout, kernel=3, stride=1, sn=True,
                          sn_iters=sn_iters, dtype=dtype)
        self.conv2 = Conv(cout, cout, kernel=3, stride=2, sn=True,
                          sn_iters=sn_iters, dtype=dtype)
        self.conv_sc = Conv(cin, cout, kernel=3, stride=2, sn=True,
                            sn_iters=sn_iters, dtype=dtype)

    def forward(self, cx: Ctx, x):
        h = cx.call(self.conv1, x)
        h = cx.call(self.conv2, relu(h))
        sc = cx.call(self.conv_sc, x)
        return (h + sc).astype(self.dtype)


class ResGenerator(Module):
    def __init__(self, config):
        super().__init__()
        c = config
        self.z_dim = c["z_dim"]
        self.use_label = c.get("use_label", False)
        self.num_classes = c.get("num_classes", 1)
        self.use_cond_bn = c.get("use_cond_bn", False) and self.use_label
        self.dtype = jnp.dtype(c.get("compute_dtype", "float32"))
        self.remat = bool(c.get("remat", False))
        gf = c["gf_dim"]
        sn_iters = c.get("sn_iters", 1)
        power = _power(c["img_size"])
        attn_at = set(c.get("attn_dim_G", [])) if c.get("use_attention") else set()
        use_pallas = c.get("use_pallas", None)
        pallas_part = c.get("pallas_partitioned", False)
        attn_ds = c.get("attn_downsample", True)
        ncls = self.num_classes if self.use_cond_bn else 0

        in_dim = self.z_dim + (self.num_classes if self.use_label else 0)
        self.gf0 = gf * 2 ** (power - 1)
        self.stem = Dense(in_dim, 4 * 4 * self.gf0, sn=True,
                          sn_iters=sn_iters, dtype=self.dtype)

        self.blocks = []
        cin, side = self.gf0, 4
        for i in range(power):
            cout = gf * 2 ** (power - 1 - i)
            side *= 2
            blk = self.add(f"up{side}", ResUpBlock(cin, cout, ncls,
                                                   self.dtype, sn_iters))
            attn = None
            if side in attn_at:
                attn = self.add(f"attn{side}", SelfAttention(
                    cout, sn_iters=sn_iters, downsample=attn_ds,
                    dtype=self.dtype, use_pallas=use_pallas,
                    pallas_partitioned=pallas_part,
                    qk_dim=c.get("attn_qk_dim"),
                    v_dim=c.get("attn_v_dim")))
            self.blocks.append((blk, attn))
            cin = cout

        self.bn_out = BatchNorm(cin, dtype=self.dtype)
        self.to_rgb = Conv(cin, 3, kernel=3, stride=1, sn=True,
                           sn_iters=sn_iters, dtype=self.dtype)

    def forward(self, cx: Ctx, z, labels=None):
        x = z.astype(self.dtype)
        if self.use_label:
            one_hot = jax.nn.one_hot(labels, self.num_classes,
                                     dtype=self.dtype)
            x = jnp.concatenate([x, one_hot], axis=-1)
        x = cx.call(self.stem, x)
        x = x.reshape(x.shape[0], 4, 4, self.gf0)
        for blk, attn in self.blocks:
            def stage(sub, x, labels, blk=blk, attn=attn):
                x = sub.call(blk, x, labels) if self.use_cond_bn \
                    else sub.call(blk, x)
                if attn is not None:
                    x = sub.call(attn, x)
                return x
            x = remat_span(cx, stage, x, labels) if self.remat \
                else stage(cx, x, labels)
        x = relu(cx.call(self.bn_out, x))
        x = cx.call(self.to_rgb, x)
        return jnp.tanh(x.astype(jnp.float32)).astype(self.dtype)


class ResDiscriminator(Module):
    def __init__(self, config):
        super().__init__()
        c = config
        self.use_label = c.get("use_label", False)
        self.num_classes = c.get("num_classes", 1)
        self.dtype = jnp.dtype(c.get("compute_dtype", "float32"))
        self.remat = bool(c.get("remat", False))
        df = c["df_dim"]
        sn_iters = c.get("sn_iters", 1)
        self._sn_iters = sn_iters
        self._use_pallas = c.get("use_pallas", None)
        self._pallas_part = c.get("pallas_partitioned", False)
        self._attn_ds = c.get("attn_downsample", True)
        self._attn_qk = c.get("attn_qk_dim")
        self._attn_v = c.get("attn_v_dim")
        power = _power(c["img_size"])
        attn_at = set(c.get("attn_dim_D", [])) if c.get("use_attention") else set()

        self.blocks = []
        side = c["img_size"] // 2
        stem = self.add(f"down{side}", OptimizedBlock(3, df, self.dtype,
                                                      sn_iters))
        self.blocks.append((stem, self._attn(side, df, attn_at)))
        cin = df
        for i in range(1, power):
            cout = df * 2 ** i
            side //= 2
            blk = self.add(f"down{side}", ResDownBlock(
                cin, cout, dtype=self.dtype, sn_iters=sn_iters))
            self.blocks.append((blk, self._attn(side, cout, attn_at)))
            cin = cout
        self.final = ResDownBlock(cin, cin, downsample=False,
                                  dtype=self.dtype, sn_iters=sn_iters)

        self.feat_dim = cin
        if self.use_label:
            self.head = Dense(cin, 1, sn=True, sn_iters=sn_iters,
                              dtype=self.dtype)
            self.embed = Embedding(self.num_classes, cin, sn=True,
                                   sn_iters=sn_iters, dtype=self.dtype)
        else:
            self.head_conv = Conv(cin, 1, kernel=4, stride=1, sn=True,
                                  sn_iters=sn_iters, dtype=self.dtype)

    def _attn(self, side, ch, attn_at):
        if side in attn_at:
            return self.add(f"attn{side}", SelfAttention(
                ch, sn_iters=self._sn_iters, downsample=self._attn_ds,
                dtype=self.dtype, use_pallas=self._use_pallas,
                pallas_partitioned=self._pallas_part,
                qk_dim=self._attn_qk, v_dim=self._attn_v))
        return None

    def forward(self, cx: Ctx, img, labels=None):
        x = img.astype(self.dtype)
        for blk, attn in self.blocks:
            def stage(sub, x, blk=blk, attn=attn):
                x = sub.call(blk, x)
                if attn is not None:
                    x = sub.call(attn, x)
                return x
            x = remat_span(cx, stage, x) if self.remat else stage(cx, x)
        x = cx.call(self.final, x)

        if self.use_label:
            feat = global_sum_pool(relu(x))
            logit = cx.call(self.head, feat)
            emb = cx.call(self.embed, labels).astype(jnp.float32)
            proj = jnp.sum(feat * emb, axis=1, keepdims=True)
            return logit.astype(jnp.float32) + proj
        # NO relu before the patch head: the reference applies
        # Conv2D(1,4,1) directly to the final block's (pre-activation
        # residual) output (sagan/models/discriminator.py:95); only the
        # projection path above relu's before pooling (:84)
        return cx.call(self.head_conv, x).astype(jnp.float32)
