"""Pallas kernels under the dp mesh: GSPMD has no partitioning rule for
tpu_custom_calls and replicates them (all-gathering the batch — measured
22 all-gathers around one warp call on 8 devices). shard_batch_call
(parallel/mesh.py) dispatches them per shard instead; these tests pin
that the sharded dispatch is collective-free, value-correct, and
differentiable (interpret-mode kernels on the 8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ppeadepth_tpu.kernels import warp_mxu
from ppeadepth_tpu.ops import cost_volume as CV
from ppeadepth_tpu.ops.sampling import grid_sample
from ppeadepth_tpu.parallel import mesh as M


@pytest.fixture
def dp_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = M.make_mesh()
    yield mesh
    M.set_active_mesh(None)


def _coords(rng, B, H, W):
    gx, gy = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    base = np.stack(
        [(gx / (W - 1) - 0.5) * 2, (gy / (H - 1) - 0.5) * 2], -1
    )[None].repeat(B, 0).astype(np.float32)
    return jnp.asarray(base + rng.rand(B, H, W, 2).astype(np.float32) * 0.1)


def test_warp_sharded_no_allgather(rng, dp_mesh):
    B, H, W, C = 8, 8, 16, 3
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    coords = _coords(rng, B, H, W)
    sh = NamedSharding(dp_mesh, P("dp"))
    img_s = jax.device_put(img, sh)
    coords_s = jax.device_put(coords, sh)

    @jax.jit
    def fn(i, c):
        f = M.shard_batch_call(
            lambda a, b: warp_mxu.grid_sample_border_mxu(
                a, b, True, "highest", "float32"),
            in_specs=(True, True), out_specs=True)
        return f(i, c)

    out = fn(img_s, coords_s)
    assert out.sharding.spec == P("dp")
    txt = fn.lower(img_s, coords_s).compile().as_text()
    assert txt.count("all-gather") == 0, "kernel operands were replicated"
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(grid_sample(img, coords, "border")),
        atol=1e-5,
    )


def test_warp_sharded_grad(rng, dp_mesh):
    B, H, W, C = 8, 8, 16, 3
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    coords = _coords(rng, B, H, W)
    cot = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    sh = NamedSharding(dp_mesh, P("dp"))

    @jax.jit
    def g_sharded(i, c):
        f = M.shard_batch_call(
            lambda a, b: warp_mxu.grid_sample_border_mxu(
                a, b, True, "highest", "float32"),
            in_specs=(True, True), out_specs=True)
        return jax.grad(lambda cc: jnp.sum(f(i, cc) * cot))(c)

    g = g_sharded(jax.device_put(img, sh), jax.device_put(coords, sh))
    g_ref = jax.grad(
        lambda cc: jnp.sum(grid_sample(img, cc, "border") * cot))(coords)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-4
    )


def test_cost_volume_sharded(rng, dp_mesh):
    B, C, h, w, D = 8, 16, 8, 16, 8
    cur = jnp.asarray(rng.rand(B, h, w, C).astype(np.float32))
    lk = jnp.asarray(rng.rand(B, 1, h, w, C).astype(np.float32))
    pose = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1, 1))
    pose[:, 0, 0, 3] = 0.11
    pose[:, 0, 1, 3] = 0.017
    pose = jnp.asarray(pose)
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1] = 0.58 * w, 1.92 * h
    K[0, 2], K[1, 2] = 0.5 * w, 0.5 * h
    Kj = jnp.tile(jnp.asarray(K), (B, 1, 1))
    iK = jnp.tile(jnp.asarray(np.linalg.pinv(K)), (B, 1, 1))
    bins = CV.compute_depth_bins(0.5, 10.0, D, "log")

    ref = jax.jit(lambda: CV.plane_sweep_cost_volume(
        cur, lk, pose, Kj, iK, bins, bin_chunk=4, backend="lax"))()[0]

    sh = NamedSharding(dp_mesh, P("dp"))
    args = [jax.device_put(a, sh) for a in (cur, lk, pose, Kj, iK)]

    @jax.jit
    def fn(cur_, lk_, pose_, K_, iK_):
        return CV.plane_sweep_cost_volume(
            cur_, lk_, pose_, K_, iK_, bins, bin_chunk=4,
            backend="mxu_f32")[0]

    out = fn(*args)
    assert out.sharding.spec == P("dp")
    txt = fn.lower(*args).compile().as_text()
    assert txt.count("all-gather") == 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
