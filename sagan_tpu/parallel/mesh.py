"""Device mesh + sharding helpers — the TPU-native replacement for
``tf.distribute.MirroredStrategy`` (/root/reference/sagan/main.py:91-98).

Instead of a strategy object that intercepts variable creation, we build a
1-D ``jax.sharding.Mesh`` over the ``data`` axis and express everything as
shardings:

* parameters / optimizer state: replicated (``P()``) — the model is tens
  of MB, far below the FSDP threshold (SURVEY.md §2.2);
* batches: sharded on ``data`` (``P('data')``);
* the train step runs under ``shard_map``; gradients and BatchNorm
  moments are combined with ``lax.pmean`` over ``data``, which XLA lowers
  to ICI all-reduces — no NCCL-analog code to write (SURVEY.md §2.3).

Multi-host: ``initialize_distributed()`` wires ``jax.distributed`` so the
same mesh spans pods; per-host data sharding is handled by the loader's
``process_index`` striding.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(num_devices: int | None = None, devices=None,
              model_parallel: int = 1) -> Mesh:
    """Device mesh over ICI.

    ``model_parallel=1`` (default): the proven 1-D data-parallel mesh.
    ``model_parallel=m > 1``: a 2-D ``(data, model)`` mesh —
    ``num_devices`` stays the TOTAL device count; the data axis is
    ``num_devices // m``.  The model axis shards the wide weight
    matrices/conv filters (see ``param_shardings``); XLA/GSPMD inserts
    the tensor-parallel collectives.  ``num_devices=None`` → all local.
    """
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            if num_devices > len(devices):
                raise ValueError(
                    f"requested {num_devices} devices, have {len(devices)}")
            devices = devices[:num_devices]
    elif num_devices is not None and num_devices != len(devices):
        # both given and disagreeing: refuse rather than silently build
        # a mesh of the wrong width (per-replica batch math downstream
        # would be wrong)
        raise ValueError(
            f"num_devices={num_devices} contradicts the {len(devices)} "
            f"explicitly passed devices")
    n = len(devices)
    if model_parallel <= 1:
        return Mesh(np.asarray(devices), (DATA_AXIS,))
    if n % model_parallel:
        raise ValueError(
            f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def model_parallel_size(mesh: Mesh) -> int:
    return (mesh.shape[MODEL_AXIS]
            if MODEL_AXIS in mesh.axis_names else 1)


def param_shardings(mesh: Mesh, tree, min_size: int = 4096):
    """Sharding pytree for a parameter/optimizer tree on a 2-D mesh.

    The rule is shape-based so it maps identically over params, Adam
    moments, and EMA copies: any leaf with ndim >= 2 whose trailing
    (output-feature) dimension divides evenly over the model axis — and
    that is big enough to be worth sharding — is split on that axis
    (Megatron-style column sharding of Dense/Conv/ConvTranspose/Embedding
    kernels, all stored [*, cout] here); everything else (biases, BN
    scales, SN power-iteration vectors, scalars) is replicated.  On a
    1-D mesh everything is replicated (the DP path).
    """
    m = model_parallel_size(mesh)

    def rule(leaf):
        leaf = jax.eval_shape(lambda x: x, leaf)  # works for arrays too
        if (m > 1 and leaf.ndim >= 2 and leaf.shape[-1] % m == 0
                and leaf.size >= min_size):
            spec = P(*([None] * (leaf.ndim - 1) + [MODEL_AXIS]))
        else:
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree.map(rule, tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """[K, B, ...] multi-step batches: steps replicated, batch sharded."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_with_sharding(a, sh: NamedSharding):
    """Public alias of the multi-process-aware device_put."""
    return _put(a, sh)


def _put(a, sh: NamedSharding):
    """device_put that works for multi-process (DCN) meshes too: when the
    sharding spans processes, the host array is the *process-local* piece
    and is assembled into the global jax.Array from every host's data."""
    if sh.mesh.size > len([d for d in sh.mesh.devices.flat
                           if d.process_index == jax.process_index()]):
        return jax.make_array_from_process_local_data(sh, np.asarray(a))
    return jax.device_put(a, sh)


def shard_batch(mesh: Mesh, *arrays):
    """Device-put host batches with leading-axis sharding over ``data``.
    Single-process: a straight device_put.  Multi-process: each host
    passes its per-host batch slice (global_batch / process_count rows)
    and the pieces form one global array."""
    sh = batch_sharding(mesh)
    out = tuple(_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated across the mesh (every host
    passes identical values in the multi-process case)."""
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda a: _put(a, sh), tree)


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host bring-up (DCN): call once per host before building the
    mesh. No-op for single-process runs."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
