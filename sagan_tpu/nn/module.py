"""Minimal functional module core for the TPU-native SAGAN framework.

Design
------
Unlike the reference's Keras wrapper/layer objects that hold mutable
``tf.Variable`` state (``/root/reference/layers.py``,
``/root/reference/sagan/layers.py``), modules here are *static
configuration only*.  All numeric state lives in a caller-owned pytree::

    variables = {"params": <trainable tree>, "aux": <non-trainable tree>}

``params`` holds trainable weights, ``aux`` holds non-trainable state —
spectral-norm power-iteration vectors and BatchNorm running moments.
``Module.__call__(variables, *args, ...)`` is a pure function returning
``(outputs, new_aux)``; under ``jax.jit``/``shard_map`` this traces to a
single XLA program with no Python-side mutation.

This fixes the two stateful bugs of the reference (SURVEY.md Appendix A.1:
the kernel division that never lands; the train/eval inversion of the
power-iteration update): state transitions here are explicit data flow.
"""

from __future__ import annotations

import zlib
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


def _fold(key: jax.Array, name: str) -> jax.Array:
    """Derive a child PRNG key deterministically from a string name."""
    return jax.random.fold_in(key, zlib.crc32(name.encode()) & 0x7FFFFFFF)


class _Spec(NamedTuple):
    shape: tuple
    dtype: Any
    init: Callable  # init(key, shape, dtype) -> array


class Ctx:
    """Apply-time context: a view into one module's slice of the variable
    tree, plus a shared accumulator of aux-state updates.

    * ``cx.param(name)`` — fetch a trainable leaf.
    * ``cx.get_aux(name)`` / ``cx.put_aux(name, value)`` — read / record
      non-trainable state; updates are merged into a fresh aux tree after
      the forward pass (purely functional).
    * ``cx.call(child, *args)`` — invoke a registered child module on its
      sub-slice of the tree.
    * ``cx.train`` — static Python bool (train vs. eval graph).
    * ``cx.axis`` — mesh axis name for cross-replica collectives
      (e.g. BatchNorm moment ``pmean``), or None on a single device.
    * ``cx.bn_accum`` — static bool: inside a gradient-accumulation
      micro-batch, BatchNorm layers *accumulate* batch moments into
      their aux slots instead of momentum-updating them; the trainer
      averages the accumulated moments and applies momentum ONCE per
      optimizer step (exact full-batch running statistics — see
      ``nn.layers.bn_accum_begin/finalize``).
    """

    __slots__ = ("module", "params", "aux", "updates", "train", "axis",
                 "rng", "path", "bn_accum", "_rng_calls")

    def __init__(self, module, params, aux, updates, train, axis, rng, path,
                 bn_accum=False):
        self._rng_calls = 0
        self.module = module
        self.params = params
        self.aux = aux
        self.updates = updates  # shared flat dict: full-path tuple -> array
        self.train = train
        self.axis = axis
        self.rng = rng
        self.path = path
        self.bn_accum = bn_accum

    # -- leaves ------------------------------------------------------------
    def param(self, name: str) -> jax.Array:
        return self.params[name]

    def get_aux(self, name: str) -> jax.Array:
        full = self.path + (name,)
        if full in self.updates:
            return self.updates[full]
        return self.aux[name]

    def put_aux(self, name: str, value: jax.Array) -> None:
        self.updates[self.path + (name,)] = value

    def make_rng(self) -> jax.Array:
        if self.rng is None:
            raise ValueError("no rng provided to apply()")
        # per-call counter: two make_rng() calls in one forward must not
        # return identical keys (correlated dropout/noise otherwise)
        n = self._rng_calls
        self._rng_calls = n + 1
        return _fold(self.rng, f"{'/'.join(self.path) or 'root'}#{n}")

    # -- children ----------------------------------------------------------
    def call(self, child: "Module", *args, **kwargs):
        name = self.module._child_name(child)
        sub = Ctx(
            child,
            self.params.get(name, {}),
            self.aux.get(name, {}),
            self.updates,
            self.train,
            self.axis,
            self.rng,
            self.path + (name,),
            self.bn_accum,
        )
        return child.forward(sub, *args, **kwargs)


class Module:
    """Base class. Subclasses declare leaves in ``__init__`` via
    ``self.param_spec`` / ``self.aux_spec`` and children by attribute
    assignment (lists/tuples of modules are auto-registered), then
    implement ``forward(cx, *args)``.
    """

    def __init__(self):
        object.__setattr__(self, "_children", {})
        object.__setattr__(self, "_pspecs", {})
        object.__setattr__(self, "_aspecs", {})

    # -- construction-time registration ------------------------------------
    def __setattr__(self, key: str, value: Any) -> None:
        if isinstance(value, Module):
            self._children[key] = value
        elif isinstance(value, (list, tuple)) and value and all(
            isinstance(v, Module) for v in value
        ):
            for i, v in enumerate(value):
                self._children[f"{key}{i}"] = v
        object.__setattr__(self, key, value)

    def add(self, name: str, module: "Module") -> "Module":
        """Register a child under an explicit name (for dynamic graphs)."""
        self._children[name] = module
        object.__setattr__(self, name.replace(".", "_"), module)
        return module

    def param_spec(self, name, shape, init, dtype=jnp.float32):
        self._pspecs[name] = _Spec(tuple(shape), dtype, init)

    def aux_spec(self, name, shape, init, dtype=jnp.float32):
        self._aspecs[name] = _Spec(tuple(shape), dtype, init)

    def iter_modules(self):
        """Depth-first walk over this module and all descendants."""
        yield self
        for child in self._children.values():
            yield from child.iter_modules()

    def _child_name(self, child: "Module") -> str:
        for name, c in self._children.items():
            if c is child:
                return name
        raise KeyError(f"{child!r} is not a registered child of {self!r}")

    # -- init --------------------------------------------------------------
    def init(self, key: jax.Array) -> dict:
        """Build the full variable tree: {"params": ..., "aux": ...}."""
        params, aux = {}, {}
        for name, spec in self._pspecs.items():
            params[name] = spec.init(_fold(key, name), spec.shape, spec.dtype)
        for name, spec in self._aspecs.items():
            aux[name] = spec.init(_fold(key, "aux:" + name), spec.shape, spec.dtype)
        for name, child in self._children.items():
            if name in params or name in aux:
                # a child silently overwriting a same-named leaf would
                # surface as a far-away type error (cx.param returning a
                # dict) or a wrong checkpoint tree
                raise ValueError(
                    f"{type(self).__name__}: child module {name!r} "
                    f"collides with a param/aux leaf of the same name")
            sub = child.init(_fold(key, name))
            if sub["params"]:
                params[name] = sub["params"]
            if sub["aux"]:
                aux[name] = sub["aux"]
        return {"params": params, "aux": aux}

    # -- apply -------------------------------------------------------------
    def forward(self, cx: Ctx, *args, **kwargs):
        raise NotImplementedError

    def __call__(self, variables: dict, *args, train: bool = False,
                 axis: str | None = None, rng: jax.Array | None = None,
                 bn_accum: bool = False, **kwargs):
        """Pure apply: returns (outputs, new_aux)."""
        updates: dict = {}
        cx = Ctx(self, variables["params"], variables["aux"], updates,
                 train, axis, rng, (), bn_accum)
        out = self.forward(cx, *args, **kwargs)
        new_aux = _merge_updates(variables["aux"], updates)
        return out, new_aux


def remat_span(cx: Ctx, fn: Callable, *args):
    """Run ``fn(cx, *args)`` under :func:`jax.checkpoint` (gradient
    rematerialization) without changing the variable tree.

    TPU memory lever (config key ``remat``): activations computed inside
    the span are NOT saved for the backward pass — XLA recomputes them
    from the span's inputs — trading ~one extra forward's FLOPs inside
    the span for HBM.  At 256px+ the per-stage activation maps dominate
    HBM; rematting each generator/discriminator stage caps residency at
    the stage *boundaries* and unlocks larger batches (better MXU
    utilization) at fixed memory.  The reference has no analog (TF2
    eager tapes keep everything; /root/reference/sagan/trainer.py).

    ``fn`` receives a fresh :class:`Ctx` view over the SAME module slice
    (same path, params, aux), so ``sub.call(child, ...)``, aux updates,
    and rng-key folding behave identically to the unrematted path; aux
    updates recorded inside the span are merged back into ``cx``.
    Specifically: the span Ctx (a) continues the parent's ``make_rng``
    call counter — a direct ``make_rng()`` at stage level draws the same
    key sequence remat on or off — and (b) is seeded with the parent's
    pending aux updates under this module's path, so ``get_aux`` of a
    value written earlier in the same forward reads the fresh value, not
    the stale pre-forward aux.  Numerics are unchanged — recomputation
    is deterministic.

    Array arguments must be passed via ``*args`` (not closed over):
    closed-over tracers are saved as residuals, defeating the point.
    """
    prefix = cx.path
    seed = {k: v for k, v in cx.updates.items() if k[: len(prefix)] == prefix}
    rng_start = cx._rng_calls
    rng_end: list = []  # captured at trace time (appended again on the
    # checkpoint recompute trace with the same value; [0] is canonical)

    def pure(params, aux, rng, seed, args):
        updates: dict = dict(seed)
        sub = Ctx(cx.module, params, aux, updates, cx.train, cx.axis, rng,
                  cx.path, cx.bn_accum)
        sub._rng_calls = rng_start
        out = fn(sub, *args)
        rng_end.append(sub._rng_calls)
        return out, updates

    out, updates = jax.checkpoint(pure)(cx.params, cx.aux, cx.rng, seed, args)
    if rng_end:
        cx._rng_calls = rng_end[0]
    cx.updates.update(updates)
    return out


def _merge_updates(aux: dict, updates: dict) -> dict:
    """Apply a flat {path: value} update dict to a nested aux tree,
    copying only along updated paths (structural sharing elsewhere)."""
    if not updates:
        return aux
    new = dict(aux)
    for path, value in updates.items():
        node = new
        for part in path[:-1]:
            child = node.get(part, {})
            child = dict(child)
            node[part] = child
            node = child
        node[path[-1]] = value
    return new
