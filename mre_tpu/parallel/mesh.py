"""Device mesh construction and sharding rules.

The reference is a single-process, single-device codebase (SURVEY.md §2.4:
no torch.distributed / NCCL / MPI anywhere). Scaling is therefore designed
fresh for TPU: a 2-D ``(data, model)`` jax.sharding.Mesh; batches shard over
``data``; the big embedding tables (entities × dim) may shard over ``model``;
XLA inserts all-reduce / all-gather collectives over ICI automatically.

All trainers in :mod:`mre_tpu.train` accept a mesh and jit their step with
NamedSharding constraints derived from these helpers; with a 1-device mesh
everything degrades to plain jit.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices.

    With ``n_data=None`` all devices not used by ``model`` go to ``data``.
    """
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    need = n_data * n_model
    if need > len(devices):
        raise ValueError(f"mesh {n_data}x{n_model} needs {need} devices, have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Leading axis over ``data``, everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def table_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard a big [rows, dim] table's rows over the ``model`` axis."""
    return NamedSharding(mesh, P(MODEL_AXIS, *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, tree):
    """Device-put a host batch pytree with leading-axis data sharding."""

    def _put(x):
        x = np.asarray(x)
        return jax.device_put(x, batch_sharding(mesh, max(x.ndim, 1)))

    return jax.tree_util.tree_map(_put, tree)


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k


def shard_transformer_ffn(params, mesh: Mesh):
    """Megatron-style tensor parallelism for the transformer FFN blocks:
    ``fc1`` kernels [D, 4D] shard their output columns over ``model`` (bias
    too), ``fc2`` kernels [4D, D] shard their input rows — the contraction
    then reduces over ``model`` and XLA inserts the all-reduce on ICI.
    Everything else is replicated. Works on any pytree containing
    TransformerMLP params (named fc1/fc2, models/transformer.py)."""

    def assign(path, x):
        keys = [getattr(k, "key", str(k)) for k in path]
        tail = "/".join(str(k) for k in keys[-2:])
        if tail == "fc1/kernel" and x.ndim == 2 and x.shape[1] % mesh.shape[MODEL_AXIS] == 0:
            spec = P(None, MODEL_AXIS)
        elif tail == "fc1/bias" and x.ndim == 1 and x.shape[0] % mesh.shape[MODEL_AXIS] == 0:
            spec = P(MODEL_AXIS)
        elif tail == "fc2/kernel" and x.ndim == 2 and x.shape[0] % mesh.shape[MODEL_AXIS] == 0:
            spec = P(MODEL_AXIS, None)
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(assign, params)
