"""'vanilla' SAGAN generator / discriminator family.

Rebuilds /root/reference/sagan/models/{generator,discriminator}.py with the
reference's bugs fixed (SURVEY.md Appendix A):
  * A.4 — conditional generator concatenates one-hot(label) with **z**
    (the reference concats an undefined ``x``);
  * A.5 — discriminator attention placement honors ``attn_dim_D``
    (the reference reads ``attn_dim_G``);
  * A.1/A.8 — spectral normalization actually normalizes (see
    ops/spectral.py); every discriminator weight is SN-wrapped (the
    reference leaves the vanilla-D heads un-normalized, a Lipschitz hole).

Shapes match the reference exactly:
  G: z[B,z_dim] (+one-hot) → SN-Dense → [B,4,4,16·gf] →
     power=log2(img/4) upsample blocks (SN-ConvT 4×4/2, no bias → BN →
     LeakyReLU 0.1), channels gf·2^p descending, attention where the
     feature side ∈ attn_dim_G → Conv 4×4 → tanh, [B,S,S,3].
  D: power downsample blocks (SN-Conv 4×4/2 → LeakyReLU 0.1), channels
     df·2^p ascending, attention where side ∈ attn_dim_D; conditional
     head = projection discriminator (sum-pool → SN-Dense(1) +
     ⟨feat, SN-Embed(label)⟩); unconditional head = 1-channel 4×4 conv map.

Extension beyond the reference: ``use_cond_bn`` switches generator BN to
class-conditional BN (BigGAN-style) for the conditional ImageNet configs
in BASELINE.json.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..nn.attention import SelfAttention
from ..nn.layers import (BatchNorm, ConditionalBatchNorm, Conv, ConvTranspose,
                         Dense, Embedding, global_sum_pool, leaky_relu)
from ..nn.module import Ctx, Module, remat_span


def _power(img_size: int) -> int:
    """#up/down-sampling stages: 64→4, 128→5
    (/root/reference/sagan/models/generator.py:30)."""
    p = int(math.log2(img_size / 4))
    if 4 * 2 ** p != img_size:
        raise ValueError(f"img_size must be 4*2^k, got {img_size}")
    return p


class Generator(Module):
    def __init__(self, config):
        super().__init__()
        c = config
        self.z_dim = c["z_dim"]
        self.img_size = c["img_size"]
        self.use_label = c.get("use_label", False)
        self.num_classes = c.get("num_classes", 1)
        self.use_cond_bn = c.get("use_cond_bn", False) and self.use_label
        self.dtype = jnp.dtype(c.get("compute_dtype", "float32"))
        self.remat = bool(c.get("remat", False))
        gf = c["gf_dim"]
        sn_iters = c.get("sn_iters", 1)
        power = _power(self.img_size)
        attn_at = set(c.get("attn_dim_G", [])) if c.get("use_attention") else set()
        use_pallas = c.get("use_pallas", None)
        pallas_part = c.get("pallas_partitioned", False)
        attn_ds = c.get("attn_downsample", True)

        in_dim = self.z_dim + (self.num_classes if self.use_label else 0)
        self.stem = Dense(in_dim, 4 * 4 * gf * 16, sn=True,
                          sn_iters=sn_iters, dtype=self.dtype)
        self.gf0 = gf * 16

        self.blocks = []  # list of (convT, bn, attn_or_None)
        cin = gf * 16
        side = 4
        for p in reversed(range(power)):
            cout = gf * 2 ** p
            side *= 2
            convt = self.add(f"up{side}_conv", ConvTranspose(
                cin, cout, kernel=4, stride=2, use_bias=False, sn=True,
                sn_iters=sn_iters, dtype=self.dtype))
            if self.use_cond_bn:
                bn = self.add(f"up{side}_bn", ConditionalBatchNorm(
                    cout, self.num_classes, dtype=self.dtype))
            else:
                bn = self.add(f"up{side}_bn", BatchNorm(cout, dtype=self.dtype))
            attn = None
            if side in attn_at:
                attn = self.add(f"attn{side}", SelfAttention(
                    cout, sn_iters=sn_iters, downsample=attn_ds,
                    dtype=self.dtype, use_pallas=use_pallas,
                    pallas_partitioned=pallas_part,
                    qk_dim=c.get("attn_qk_dim"),
                    v_dim=c.get("attn_v_dim")))
            self.blocks.append((convt, bn, attn))
            cin = cout

        self.to_rgb = Conv(cin, 3, kernel=4, stride=1, use_bias=False,
                           dtype=self.dtype)

    def forward(self, cx: Ctx, z, labels=None):
        x = z.astype(self.dtype)
        if self.use_label:
            one_hot = jax.nn.one_hot(labels, self.num_classes,
                                     dtype=self.dtype)
            x = jnp.concatenate([x, one_hot], axis=-1)
        x = cx.call(self.stem, x)
        x = x.reshape(x.shape[0], 4, 4, self.gf0)
        for convt, bn, attn in self.blocks:
            def stage(sub, x, labels, convt=convt, bn=bn, attn=attn):
                x = sub.call(convt, x)
                x = sub.call(bn, x, labels) if self.use_cond_bn \
                    else sub.call(bn, x)
                x = leaky_relu(x, 0.1)
                if attn is not None:
                    x = sub.call(attn, x)
                return x
            x = remat_span(cx, stage, x, labels) if self.remat \
                else stage(cx, x, labels)
        x = cx.call(self.to_rgb, x)
        return jnp.tanh(x.astype(jnp.float32)).astype(self.dtype)


class Discriminator(Module):
    def __init__(self, config):
        super().__init__()
        c = config
        self.img_size = c["img_size"]
        self.use_label = c.get("use_label", False)
        self.num_classes = c.get("num_classes", 1)
        self.dtype = jnp.dtype(c.get("compute_dtype", "float32"))
        self.remat = bool(c.get("remat", False))
        df = c["df_dim"]
        sn_iters = c.get("sn_iters", 1)
        power = _power(self.img_size)
        attn_at = set(c.get("attn_dim_D", [])) if c.get("use_attention") else set()
        use_pallas = c.get("use_pallas", None)
        pallas_part = c.get("pallas_partitioned", False)
        attn_ds = c.get("attn_downsample", True)

        self.blocks = []
        cin, side = 3, self.img_size
        for p in range(power):
            cout = df * 2 ** p
            side //= 2
            conv = self.add(f"down{side}_conv", Conv(
                cin, cout, kernel=4, stride=2, sn=True, sn_iters=sn_iters,
                dtype=self.dtype))
            attn = None
            if side in attn_at:
                attn = self.add(f"attn{side}", SelfAttention(
                    cout, sn_iters=sn_iters, downsample=attn_ds,
                    dtype=self.dtype, use_pallas=use_pallas,
                    pallas_partitioned=pallas_part,
                    qk_dim=c.get("attn_qk_dim"),
                    v_dim=c.get("attn_v_dim")))
            self.blocks.append((conv, attn))
            cin = cout

        self.feat_dim = cin
        if self.use_label:
            self.head = Dense(cin, 1, sn=True, sn_iters=sn_iters,
                              dtype=self.dtype)
            self.embed = Embedding(self.num_classes, cin, sn=True,
                                   sn_iters=sn_iters, dtype=self.dtype)
        else:
            self.head_conv = Conv(cin, 1, kernel=4, stride=1, sn=True,
                                  sn_iters=sn_iters, dtype=self.dtype)

    def forward(self, cx: Ctx, img, labels=None):
        x = img.astype(self.dtype)
        for conv, attn in self.blocks:
            def stage(sub, x, conv=conv, attn=attn):
                x = sub.call(conv, x)
                x = leaky_relu(x, 0.1)
                if attn is not None:
                    x = sub.call(attn, x)
                return x
            x = remat_span(cx, stage, x) if self.remat else stage(cx, x)

        if self.use_label:
            # projection discriminator (Miyato & Koyama 2018;
            # /root/reference/sagan/models/discriminator.py:26-33)
            feat = global_sum_pool(x)                      # [B, C] fp32
            logit = cx.call(self.head, feat)               # [B, 1]
            emb = cx.call(self.embed, labels).astype(jnp.float32)
            proj = jnp.sum(feat * emb, axis=1, keepdims=True)
            return (logit.astype(jnp.float32) + proj)
        # PatchGAN-style map [B,4,4,1]
        # (/root/reference/sagan/models/discriminator.py:35-36)
        return cx.call(self.head_conv, x).astype(jnp.float32)
