"""Device mesh + sharding for data-parallel training over ICI.

The entire reference distributed layer (distributed_util.py: NCCL process
group, param broadcast, hand-rolled bucketed gradient allreduce, loss
allreduce) dissolves into sharding annotations here: a 1-D ``('data',)`` mesh,
batch sharded over it, parameters replicated, and XLA inserting the gradient
psum inside the jitted train step.  Scaling to a multi-host slice is the same
program — the mesh just gets bigger.

``make_mesh(data=-1)`` uses every visible device (the reference's
``torch.cuda.device_count()`` world-size convention, train.py:233).
"""

from __future__ import annotations

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices) if data in (-1, None) else data
    mesh_devices = mesh_utils.create_device_mesh((n,), devices=devices[:n])
    return Mesh(mesh_devices, ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host numpy batch onto the mesh, split along axis 0.

    Single-process: a plain sharded device_put.  Multi-host: ``batch`` is
    this process's LOCAL shard (global_batch / process_count rows, from its
    DistributedSampler-style loader shard) and the global array is
    assembled from the per-process shards without any cross-host copy
    (jax.make_array_from_process_local_data)."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(
            batch_sharding(mesh), batch)
    return jax.device_put(batch, batch_sharding(mesh))


def is_main_process() -> bool:
    """Rank-0 gate for filesystem/logging side effects (the reference's
    rank-0-only checkpoint/wandb writes, reference train.py:156-186)."""
    return jax.process_index() == 0


def mesh_from_cfg(mesh_cfg) -> Mesh:
    data = -1
    if mesh_cfg is not None:
        data = mesh_cfg.get("data", -1)
    return make_mesh(data=data)
