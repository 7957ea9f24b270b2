"""Core layers: Dense / Conv / ConvTranspose / Embedding with optional
fused spectral normalization, plus cross-replica (Batch|ConditionalBatch)Norm.

Replaces the reference's Keras layers + ``SpectralNormalization`` wrapper
(``/root/reference/layers.py:7-68``, ``/root/reference/sagan/layers.py``).
Rather than wrapping layer objects, spectral norm is a constructor flag
(``sn=True``): the layer owns the power-iteration vector ``u`` in its aux
state and normalizes its kernel inline — one less indirection, and XLA
fuses the ``w/sigma`` scale into the conv/matmul weight path.

Layout & precision conventions (TPU-first):
* activations NHWC, conv kernels HWIO — XLA TPU's preferred conv layout;
* parameters and norm statistics are fp32; matmuls/convs run in the
  layer's ``dtype`` (bf16 by default in models) — the TPU MXU accumulates
  bf16 products in fp32 internally; fp32 inputs use Precision.HIGHEST so
  no backend silently demotes them;
* BatchNorm moments are computed in fp32 and, when ``cx.axis`` names a
  mesh axis, reduced with ``lax.pmean`` across replicas — closing the
  per-replica-statistics gap of the reference (SURVEY.md §2.2, last row).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.util import matmul_precision
from . import initializers as init
from .module import Ctx, Module


def _maybe_sn(cx: Ctx, layer, w):
    """Apply spectral normalization to a kernel if the layer asked for it."""
    if not layer.sn:
        return w
    from ..ops.spectral import spectral_normalize

    u = cx.get_aux("u")
    w_bar, u_new = spectral_normalize(
        w, u, n_iter=layer.sn_iters,
        backend=getattr(layer, "sn_backend", "xla"),
        interpret=getattr(layer, "sn_interpret", False))
    if cx.train:
        cx.put_aux("u", u_new)
    return w_bar


def set_sn_backend(root, backend: str, interpret: bool = False) -> None:
    """Route every SN-wrapped layer under ``root`` through ``backend``
    ('xla' | 'pallas').  Per-model configuration (not a process global):
    two models with different backends coexist and retrace independently."""
    for m in root.iter_modules():
        if getattr(m, "sn", False):
            m.sn_backend = backend
            m.sn_interpret = interpret


class Dense(Module):
    """y = x @ W (+ b), optionally spectrally normalized.

    Reference: ``SpectralNormalization(layers.Dense(...))`` at
    /root/reference/sagan/models/generator.py:25.
    """

    def __init__(self, cin, cout, use_bias=True, sn=False, sn_iters=1,
                 w_init=init.glorot_uniform, dtype=jnp.float32):
        super().__init__()
        self.cin, self.cout = cin, cout
        self.use_bias, self.sn, self.sn_iters = use_bias, sn, sn_iters
        self.dtype = dtype
        self.param_spec("w", (cin, cout), w_init)
        if use_bias:
            self.param_spec("b", (cout,), init.zeros)
        if sn:
            self.aux_spec("u", (cout,), init.l2_normal)

    def forward(self, cx: Ctx, x):
        w = _maybe_sn(cx, self, cx.param("w"))
        y = jnp.dot(x.astype(self.dtype), w.astype(self.dtype),
                    precision=matmul_precision(self.dtype))
        if self.use_bias:
            y = y + cx.param("b")
        return y.astype(self.dtype)


class Conv(Module):
    """NHWC conv, 'SAME' padding, optional SN.

    Reference: SN-wrapped ``layers.Conv2D`` blocks at
    /root/reference/sagan/models/discriminator.py:8-11.
    """

    def __init__(self, cin, cout, kernel=3, stride=1, use_bias=True,
                 sn=False, sn_iters=1, w_init=init.glorot_uniform,
                 dtype=jnp.float32, padding="SAME"):
        super().__init__()
        self.cin, self.cout = cin, cout
        self.kernel, self.stride, self.padding = kernel, stride, padding
        self.use_bias, self.sn, self.sn_iters = use_bias, sn, sn_iters
        self.dtype = dtype
        self.param_spec("w", (kernel, kernel, cin, cout), w_init)
        if use_bias:
            self.param_spec("b", (cout,), init.zeros)
        if sn:
            self.aux_spec("u", (cout,), init.l2_normal)

    def forward(self, cx: Ctx, x):
        w = _maybe_sn(cx, self, cx.param("w"))
        y = lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=matmul_precision(self.dtype),
        )
        if self.use_bias:
            y = y + cx.param("b")
        return y.astype(self.dtype)


class ConvTranspose(Module):
    """NHWC transposed conv ('SAME', stride s → s× upsampling), optional SN.

    Reference: SN-wrapped ``layers.Conv2DTranspose(out, 4, 2)`` generator
    blocks at /root/reference/sagan/models/generator.py:8-9.
    """

    def __init__(self, cin, cout, kernel=4, stride=2, use_bias=True,
                 sn=False, sn_iters=1, w_init=init.glorot_uniform,
                 dtype=jnp.float32):
        super().__init__()
        self.cin, self.cout = cin, cout
        self.kernel, self.stride = kernel, stride
        self.use_bias, self.sn, self.sn_iters = use_bias, sn, sn_iters
        self.dtype = dtype
        self.param_spec("w", (kernel, kernel, cin, cout), w_init)
        if use_bias:
            self.param_spec("b", (cout,), init.zeros)
        if sn:
            self.aux_spec("u", (cout,), init.l2_normal)

    def forward(self, cx: Ctx, x):
        w = _maybe_sn(cx, self, cx.param("w"))
        # transpose_kernel=True reproduces TF/Keras Conv2DTranspose
        # exactly (gradient-of-conv: spatial flip + I/O swap); the swap
        # below presents our HWIO kernel in the [kh,kw,cout,cin] layout
        # that mode expects.  Verified bit-level in test_tf_parity.py.
        y = lax.conv_transpose(
            x.astype(self.dtype),
            jnp.swapaxes(w, 2, 3).astype(self.dtype),
            strides=(self.stride, self.stride),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True,
            precision=matmul_precision(self.dtype),
        )
        if self.use_bias:
            y = y + cx.param("b")
        return y.astype(self.dtype)


class Embedding(Module):
    """Integer → vector lookup (projection-discriminator class embedding,
    /root/reference/sagan/models/discriminator.py:31)."""

    def __init__(self, num_embeddings, dim, sn=False, sn_iters=1,
                 w_init=init.uniform(0.05), dtype=jnp.float32):
        super().__init__()
        self.num_embeddings, self.dim = num_embeddings, dim
        self.sn, self.sn_iters = sn, sn_iters
        self.dtype = dtype
        self.param_spec("w", (num_embeddings, dim), w_init)
        if sn:
            self.aux_spec("u", (dim,), init.l2_normal)

    def forward(self, cx: Ctx, ids):
        w = _maybe_sn(cx, self, cx.param("w"))
        return jnp.take(w, ids, axis=0).astype(self.dtype)


def _batch_moments(x, axis_name):
    """fp32 batch+spatial (mean, mean-of-squares); pmean'd over the data
    mesh axis when present (cross-replica BN — reference lacks this,
    SURVEY.md §2.2).  Returning E[x²] rather than the variance keeps the
    moments *linear* in the data, so micro-batch moments average exactly
    to full-batch moments (the grad-accumulation exactness relies on
    this; ``_var_from_moments`` recovers the variance)."""
    x32 = x.astype(jnp.float32)
    reduce_axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x32, axis=reduce_axes)
    mean_sq = jnp.mean(jnp.square(x32), axis=reduce_axes)
    if axis_name is not None:
        mean = lax.pmean(mean, axis_name)
        mean_sq = lax.pmean(mean_sq, axis_name)
    return mean, mean_sq


def _var_from_moments(mean, mean_sq):
    return jnp.maximum(mean_sq - jnp.square(mean), 0.0)


class BatchNorm(Module):
    """Batch normalization with cross-replica statistics.

    Matches Keras defaults used by the reference
    (``layers.BatchNormalization()`` at
    /root/reference/sagan/models/generator.py:10): momentum 0.99,
    eps 1e-3, per-channel affine.  Unlike the reference, train-time
    moments are ``lax.pmean``-reduced across the data axis so replicas
    normalize identically.
    """

    def __init__(self, c, momentum=0.99, eps=1e-3, dtype=jnp.float32):
        super().__init__()
        self.c, self.momentum, self.eps, self.dtype = c, momentum, eps, dtype
        self.param_spec("gamma", (c,), init.ones)
        self.param_spec("beta", (c,), init.zeros)
        self.aux_spec("mean", (c,), init.zeros)
        self.aux_spec("var", (c,), init.ones)

    def forward(self, cx: Ctx, x):
        gamma = cx.param("gamma")
        beta = cx.param("beta")
        return _bn_core(cx, self, x, gamma, beta)


class ConditionalBatchNorm(Module):
    """Class-conditional BN: per-class gamma/beta via embedding tables
    (the BigGAN/SAGAN conditional-generator norm; extension beyond the
    reference for the conditional ImageNet configs in BASELINE.json)."""

    def __init__(self, c, num_classes, momentum=0.99, eps=1e-3,
                 dtype=jnp.float32):
        super().__init__()
        self.c, self.momentum, self.eps, self.dtype = c, momentum, eps, dtype
        self.param_spec("gamma", (num_classes, c), init.ones)
        self.param_spec("beta", (num_classes, c), init.zeros)
        self.aux_spec("mean", (c,), init.zeros)
        self.aux_spec("var", (c,), init.ones)

    def forward(self, cx: Ctx, x, labels):
        gamma = jnp.take(cx.param("gamma"), labels, axis=0)[:, None, None, :]
        beta = jnp.take(cx.param("beta"), labels, axis=0)[:, None, None, :]
        return _bn_core(cx, self, x, gamma, beta)


def _bn_core(cx: Ctx, layer, x, gamma, beta):
    if cx.train:
        mean, mean_sq = _batch_moments(x, cx.axis)
        var = _var_from_moments(mean, mean_sq)
        if cx.bn_accum:
            # gradient-accumulation micro-batch: the slots hold running
            # SUMS of (mean, mean-of-squares) across micro-batches —
            # bn_accum_begin zeroed them, bn_accum_finalize averages
            # and applies momentum ONCE per optimizer step, so running
            # statistics are exactly the unaccumulated step's
            # (normalization itself stays per-micro-batch: full-batch
            # normalization would need a second pass over the data).
            cx.put_aux("mean", cx.get_aux("mean") + mean)
            cx.put_aux("var", cx.get_aux("var") + mean_sq)
        else:
            m = layer.momentum
            cx.put_aux("mean", m * cx.get_aux("mean") + (1.0 - m) * mean)
            cx.put_aux("var", m * cx.get_aux("var") + (1.0 - m) * var)
    else:
        mean, var = cx.get_aux("mean"), cx.get_aux("var")
    inv = lax.rsqrt(var + layer.eps)
    y = (x.astype(jnp.float32) - mean) * inv * gamma + beta
    return y.astype(layer.dtype)


def bn_moment_paths(root):
    """``[(aux-path tuple, momentum)]`` for every (Conditional)BatchNorm
    under ``root`` — the moment leaves live at ``path + ("mean"|"var",)``
    in the nested aux tree.  Used by the trainer's exact
    gradient-accumulation path (``bn_accum_begin``/``finalize``)."""
    out = []

    def walk(mod, path):
        if isinstance(mod, (BatchNorm, ConditionalBatchNorm)):
            out.append((path, mod.momentum))
        for name, child in mod._children.items():
            walk(child, path + (name,))

    walk(root, ())
    return out


def _aux_node(aux, path):
    for p in path:
        aux = aux[p]
    return aux


def bn_accum_begin(paths, aux):
    """Zero the BN moment slots — during the micro-batch scan they hold
    running SUMS of per-micro (mean, mean-of-squares) (``_bn_core`` with
    ``cx.bn_accum``).  Returns ``(aux0, saved running stats)``."""
    from .module import _merge_updates

    updates, saved = {}, {}
    for path, _ in paths:
        node = _aux_node(aux, path)
        saved[path] = (node["mean"], node["var"])
        updates[path + ("mean",)] = jnp.zeros_like(node["mean"])
        updates[path + ("var",)] = jnp.zeros_like(node["var"])
    return _merge_updates(aux, updates), saved


def bn_accum_finalize(paths, aux, saved, n):
    """Average the accumulated moment sums over ``n`` micro-batches and
    momentum-update the saved running stats ONCE — because mean and
    E[x²] are linear in the data, the result is bit-for-bit the
    full-batch statistics an unaccumulated step would produce
    (up to fp32 summation order)."""
    from .module import _merge_updates

    updates = {}
    for path, momentum in paths:
        node = _aux_node(aux, path)
        mean_avg = node["mean"] / n
        var_avg = _var_from_moments(mean_avg, node["var"] / n)
        old_mean, old_var = saved[path]
        updates[path + ("mean",)] = (momentum * old_mean +
                                     (1.0 - momentum) * mean_avg)
        updates[path + ("var",)] = (momentum * old_var +
                                    (1.0 - momentum) * var_avg)
    return _merge_updates(aux, updates)


def leaky_relu(x, alpha=0.1):
    """LeakyReLU(0.1) as used throughout the reference models
    (/root/reference/sagan/models/generator.py:11)."""
    return jax.nn.leaky_relu(x, negative_slope=alpha)


def max_pool(x, window=2, stride=2):
    """Stride-2 2×2 max pool — the K/V 4× downsample the reference's
    attention *intended* (/root/reference/layers.py:96 comment) but broke
    with ``MaxPool2D(2, 1)`` (SURVEY.md Appendix A.2)."""
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


def global_sum_pool(x):
    """Spatial sum pool [B,H,W,C] → [B,C]
    (/root/reference/sagan/models/discriminator.py:27)."""
    return jnp.sum(x.astype(jnp.float32), axis=(1, 2))
