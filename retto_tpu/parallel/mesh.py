"""Device mesh + sharding helpers.

The communication layer of this framework (SURVEY.md §2 "Parallelism &
distributed communication": the slot NCCL/MPI occupies in a GPU design).
Everything is declarative: shardings are annotated, XLA inserts the ICI
collectives.  Used by both inference (JaxEngine batch sharding) and
training (train.trainer).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "data_sharding", "replicate"]


def make_mesh(
    n_devices: int | None = None, model_parallel: int = 1, devices=None
) -> Mesh:
    """('data', 'model') mesh over the first n devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(
            f"{n} devices not divisible by model_parallel={model_parallel}"
        )
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch-dim sharding spec."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, x: jax.Array) -> jax.Array:
    """Place x with its leading dim sharded over 'data' (pads are the
    caller's job: batch buckets are multiples of the mesh size)."""
    return jax.device_put(x, data_sharding(mesh))
