"""Worker for the two-process jax.distributed DP test.

Run as: python tests/dist_worker.py <coord_addr> <num_procs> <pid> <outdir>

Each process contributes its one CPU device to a global 2-device 'dp'
mesh, feeds ITS HALF of a deterministic global batch through
parallel/mesh.shard_batch's multi-host branch
(jax.make_array_from_process_local_data, mesh.py:64-71 — the path that
is dead code in every single-process test), runs one jitted train step,
and process 0 writes the loss and a checkpoint. The parent test asserts
the loss equals the single-process value — the contract accelerate's
multi-node launch provides the reference (train.py:39, trainer.py:220).
"""

import json
import os
import sys


def main():
    coord, nproc, pid, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    # share the suite's persistent compile cache (conftest.py). Unlike
    # the suite, cache >=1 s compiles: this test's cost is three process
    # launches x many mid-sized compiles, none of which clears the
    # suite's 5 s bar on its own.
    jax.config.update("jax_compilation_cache_dir", ".jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == nproc, jax.devices()

    import numpy as np

    # Establish the gloo communicator NOW, while the processes are still
    # aligned from initialize(): gloo context creation exchanges ranks
    # through the coordination KV store with a hardcoded 30 s timeout,
    # and on this 1-core host the workers' later tracing/compile phases
    # timeshare, so the FIRST collective can otherwise be reached >30 s
    # apart (observed flake: "Gloo context initialization failed:
    # DEADLINE_EXCEEDED"). Subsequent collectives reuse the context.
    if nproc > 1:
        from jax.experimental import multihost_utils

        multihost_utils.process_allgather(np.zeros(1, np.float32))
    print("worker: gloo context established", flush=True)

    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from ppeadepth_tpu.options import Config
    from ppeadepth_tpu.models import RepDepth
    from ppeadepth_tpu.parallel import mesh as M
    from ppeadepth_tpu.train import schedule
    from ppeadepth_tpu.train.step import create_train_state, make_train_step
    from ppeadepth_tpu.ckpt import io as ckpt_io
    from tests.test_train_step import TINY, make_batch

    opt = TINY.replace(batch_size=2, num_depth_bins=4)
    B = opt.batch_size

    mesh = M.make_mesh()
    assert mesh.devices.size == nproc

    model = RepDepth(opt)
    global_batch = make_batch(opt, B, seed=0)
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "droppath": jax.random.PRNGKey(1),
         "aug": jax.random.PRNGKey(2)},
        global_batch, 0.1, 10.0, False)
    tx = schedule.make_optimizer(1e-4, steps_per_epoch=10)
    state = create_train_state(model, variables, opt, tx)
    state = M.replicate(state, mesh)

    # Align processes before the FIRST gloo collective: its context
    # init has a fixed 30 s KV-store timeout, and on a 1-core host the
    # two workers timeshare through their heavy tracing/compile phase,
    # so one can reach the collective >30 s before the other (observed
    # flake: "Gloo context initialization failed: DEADLINE_EXCEEDED").
    # The coordination-service barrier takes an explicit long timeout.
    from jax._src import distributed

    if distributed.global_state.client is not None and nproc > 1:
        distributed.global_state.client.wait_at_barrier(
            "dist_worker_pre_collective", 1_200_000)
    print("worker: passed pre-collective barrier", flush=True)

    # per-process LOCAL shard of the global batch (what each host's
    # loader would produce) -> multi-host assembly in shard_batch
    per = B // nproc
    local = {k: np.asarray(v)[pid * per:(pid + 1) * per]
             for k, v in global_batch.items()}
    sharded = M.shard_batch(local, mesh)
    got_B = jax.tree_util.tree_leaves(sharded)[0].shape[0]
    assert got_B == B, f"global batch {got_B} != {B}"

    step_fn = make_train_step(model, opt, tx, donate=False)
    state, metrics = step_fn(state, sharded, jax.random.PRNGKey(42))
    loss = float(jax.device_get(metrics["loss"]))

    if pid == 0:
        ckpt_io.save_checkpoint(os.path.join(outdir, "ckpt"), state, opt)
        with open(os.path.join(outdir, "loss.json"), "w") as f:
            json.dump({"loss": loss,
                       "min_bin": float(
                           jax.device_get(state.min_depth_bin))}, f)
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("dist_worker_done")
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
