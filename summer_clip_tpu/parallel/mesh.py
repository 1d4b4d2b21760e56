"""Device mesh setup + sharding helpers.

The reference has no working distributed execution (SURVEY.md §2.9:
Accelerate pinned to ``distributed_type: 'NO'``, slurm single-GPU jobs).
This framework is multi-chip by construction:

- :func:`create_mesh` builds a ``jax.sharding.Mesh`` over ``data`` (batch /
  DP) and ``model`` (cache-length / N-sharding) axes,
- :func:`distributed_init` wraps ``jax.distributed.initialize`` for
  multi-host pods (DCN rendezvous), no-op on single host,
- helpers to replicate params and shard batches.
"""

from __future__ import annotations

import typing as tp

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["create_mesh", "distributed_init", "replicate", "shard_batch", "P", "Mesh", "NamedSharding"]


def distributed_init(coordinator_address: tp.Optional[str] = None,
                     num_processes: tp.Optional[int] = None,
                     process_id: tp.Optional[int] = None) -> None:
    """Initialize multi-host JAX when env/args indicate a pod; else no-op."""
    import os

    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)


def create_mesh(data: tp.Optional[int] = None, model: int = 1,
                devices: tp.Optional[tp.Sequence[jax.Device]] = None) -> Mesh:
    """Mesh over ('data', 'model'). Defaults: all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def replicate(tree: tp.Any, mesh: Mesh) -> tp.Any:
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(tree: tp.Any, mesh: Mesh, axis: str = "data") -> tp.Any:
    def put(x):
        spec = P(axis, *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree)
