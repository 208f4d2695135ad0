"""Device mesh + sharding helpers (the distributed runtime, L0).

The reference's only multi-device strategy is data parallelism via HF
accelerate / torch DDP / NCCL (SURVEY §2.11). Here DP is a 1-D
`jax.sharding.Mesh` over the 'dp' axis: the batch is sharded, params and
train state are replicated, and every collective the reference issues by
hand or via DDP (gradient allreduce, depth-bin min/max reduce, SyncBN
stats) falls out of XLA's SPMD partitioner inside the single jitted train
step, riding ICI.

Multi-host: call `jax.distributed.initialize()` before building the mesh;
`jax.devices()` then spans all hosts and per-host data loading feeds
`make_array_from_process_local_data`.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("dp",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree on the mesh, sharded over the batch axis.

    Multi-host: each process feeds its local shard of the global batch
    (jax.make_array_from_process_local_data assembles the global view).
    """
    s = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                s, np.asarray(x)
            ),
            batch,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / train state) across the mesh."""
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
