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

import contextlib
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_ACTIVE_MESH: Optional[Mesh] = None


def set_active_mesh(mesh: Optional[Mesh]):
    """Record the mesh batch-parallel pallas kernels shard over
    (shard_batch_call). make_mesh sets it automatically."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


@contextlib.contextmanager
def using_mesh(mesh: Optional[Mesh]):
    """Scope the active mesh: restores the previous one on exit, so
    library/tool callers can't leak a stale mesh into later jits
    (shard_batch_call also falls back to a direct call when the batch
    isn't divisible by the recorded axis, as a second line of defense)."""
    prev = active_mesh()
    set_active_mesh(mesh)
    try:
        yield mesh
    finally:
        set_active_mesh(prev)


def make_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    mesh = Mesh(np.asarray(devices), ("dp",))
    set_active_mesh(mesh)
    return mesh


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree on the mesh, sharded over the batch axis.

    NOTE (round-3 measurement): sharding annotations are kept even on a
    1-device mesh ON PURPOSE. The GSPMD compile differs from bare jit in
    both directions: it fuses the remat_loss checkpointed section better
    (sharded remat 524 ms vs bare remat ~570 at bs 12), while its
    no-remat program picks batch-minor tiled layouts for the full-res
    decoder head residuals (5.3x padding, 3 x ~487 MB) and stops fitting
    where bare jit fits. The default trainer path (remat_loss on at
    bs >= 12) is the one that must be fast. See BENCHMARKS.md.

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


def shard_batch_call(fn, in_specs, out_specs, axis: str = "dp"):
    """Run a batch-parallel function per-shard over the ambient mesh.

    GSPMD has no partitioning rule for pallas `tpu_custom_call`s: under a
    jit with dp-sharded inputs it fully REPLICATES them — inserting
    all-gathers of the operands around every kernel invocation (measured:
    22 all-gathers around one warp call on an 8-device mesh). Wrapping
    the call in `jax.shard_map` over the abstract mesh that jit makes
    ambient dispatches the kernel per shard with local batches instead.

    in_specs/out_specs use False for replicated operands (mapped to
    P()). Uses the active mesh recorded by make_mesh (plain jit does not
    make an abstract mesh ambient in this JAX version); falls back to a
    direct call when there is no active mesh or the axis is absent /
    size-1 (single-chip paths, bench/profile jits, CPU tests).
    Differentiable: shard_map composes with custom_vjp'd fns.
    """
    mesh = active_mesh()
    if (
        mesh is None
        or axis not in mesh.axis_names
        or mesh.shape[axis] == 1
    ):
        return fn

    def to_spec(s):
        return P(axis) if s else P()

    sharded = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=tuple(to_spec(s) for s in in_specs),
        out_specs=jax.tree_util.tree_map(
            to_spec, out_specs, is_leaf=lambda x: isinstance(x, bool)
        ),
        check_vma=False,
    )
    n = mesh.shape[axis]

    def call(*args):
        # a stale active mesh (recorded by an earlier make_mesh, batch not
        # divisible by its axis) must not fail shard_map's divisibility
        # check in an unrelated later jit — run the kernel directly then
        for a, s in zip(args, in_specs):
            if s and a.shape[0] % n != 0:
                return fn(*args)
        return sharded(*args)

    return call
