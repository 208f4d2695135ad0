"""Two-process jax.distributed data parallelism (SURVEY §2.11's
multi-host TPU equivalent; reference contract: accelerate multi-node,
/root/reference/ppeadepth/train.py:39 + trainer.py:220-222).

Spawns real OS processes, each owning ONE CPU device, joined by
jax.distributed.initialize over a localhost coordinator. Exercises the
only code path every single-process test leaves dead:
parallel/mesh.shard_batch's `make_array_from_process_local_data` branch
(mesh.py:64-71) — per-process local batch halves assembled into the
global dp-sharded array — plus process-0-only checkpointing. The loss
must equal the single-process run bit-for-tolerance."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "dist_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # one real device per process (strip the 8-virtual-device flag the
    # test harness sets)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _launch(nproc, outdir):
    port = _free_port()
    coord = f"localhost:{port}"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, str(nproc), str(pid), outdir],
            env=_worker_env(), cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=2400)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    with open(os.path.join(outdir, "loss.json")) as f:
        return json.load(f)


def test_two_process_dp_matches_single_process(tmp_path):
    if sys.platform != "linux":
        pytest.skip("gloo collectives test is linux-only")
    one = tmp_path / "p1"
    two = tmp_path / "p2"
    one.mkdir(), two.mkdir()

    # single-process oracle through the same worker (same env: 1 device)
    ref = _launch(1, str(one))
    got = _launch(2, str(two))

    # sharding changes f32 reduction order (global-batch BN statistics,
    # gradient psum): measured 2-proc vs 1-proc delta is ~3.5e-5 relative
    np.testing.assert_allclose(got["loss"], ref["loss"], rtol=3e-4)
    np.testing.assert_allclose(got["min_bin"], ref["min_bin"], rtol=3e-4)
    # process-0-only checkpoint exists and loads
    assert os.path.exists(os.path.join(str(two), "ckpt", "model.msgpack"))
