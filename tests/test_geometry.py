"""Golden tests for core geometry vs closed-form values and torch reference
semantics (torch CPU is available in the image and used only in tests)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ppeadepth_tpu.core import geometry as G

torch = pytest.importorskip("torch")


def _torch_rot_from_axisangle(vec):
    # re-derivation of the Rodrigues formula used by the reference
    angle = torch.norm(vec, 2, 2, True)
    axis = vec / (angle + 1e-7)
    ca, sa = torch.cos(angle), torch.sin(angle)
    C = 1 - ca
    x = axis[..., 0].unsqueeze(1)
    y = axis[..., 1].unsqueeze(1)
    z = axis[..., 2].unsqueeze(1)
    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC
    rot = torch.zeros((vec.shape[0], 4, 4))
    rot[:, 0, 0] = torch.squeeze(x * xC + ca)
    rot[:, 0, 1] = torch.squeeze(xyC - zs)
    rot[:, 0, 2] = torch.squeeze(zxC + ys)
    rot[:, 1, 0] = torch.squeeze(xyC + zs)
    rot[:, 1, 1] = torch.squeeze(y * yC + ca)
    rot[:, 1, 2] = torch.squeeze(yzC - xs)
    rot[:, 2, 0] = torch.squeeze(zxC - ys)
    rot[:, 2, 1] = torch.squeeze(yzC + xs)
    rot[:, 2, 2] = torch.squeeze(z * zC + ca)
    rot[:, 3, 3] = 1
    return rot


def test_rot_from_axisangle_matches_rodrigues(rng):
    vec = rng.randn(4, 3).astype(np.float32) * 0.3
    ours = np.asarray(G.rot_from_axisangle(jnp.asarray(vec)))
    ref = _torch_rot_from_axisangle(torch.from_numpy(vec)[:, None, :]).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_se3_invert_roundtrip(rng):
    axis = jnp.asarray(rng.randn(2, 3).astype(np.float32) * 0.2)
    trans = jnp.asarray(rng.randn(2, 3).astype(np.float32))
    A = G.transformation_from_parameters(axis, trans, invert=True)
    B = G.transformation_from_parameters(axis, trans, invert=False)
    prod = np.asarray(A @ B)
    np.testing.assert_allclose(
        prod, np.broadcast_to(np.eye(4), prod.shape), atol=1e-5
    )


def test_disp_to_depth_range():
    disp = jnp.asarray([0.0, 0.5, 1.0])
    scaled, depth = G.disp_to_depth(disp, 0.1, 100.0)
    np.testing.assert_allclose(depth[0], 100.0, rtol=1e-5)
    np.testing.assert_allclose(depth[2], 0.1, rtol=1e-5)
    assert np.all(np.diff(np.asarray(depth)) < 0)


def test_backproject_project_identity(rng):
    """Projecting backprojected points with T=I recovers the pixel grid."""
    B, H, W = 2, 6, 8
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 3.0, 4.0, W / 2, H / 2
    Kb = jnp.asarray(np.stack([K] * B))
    invKb = jnp.asarray(np.stack([np.linalg.pinv(K)] * B))
    depth = jnp.asarray(rng.rand(B, H, W).astype(np.float32) + 0.5)
    pts = G.backproject_depth(depth, invKb)
    coords = G.project_3d(pts, Kb, jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * B)), H, W)
    gx, gy = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    exp_x = (gx / (W - 1) - 0.5) * 2
    exp_y = (gy / (H - 1) - 0.5) * 2
    np.testing.assert_allclose(np.asarray(coords[..., 0]), np.broadcast_to(exp_x, (B, H, W)), atol=1e-4)
    np.testing.assert_allclose(np.asarray(coords[..., 1]), np.broadcast_to(exp_y, (B, H, W)), atol=1e-4)


def test_reproject_coords_matches_two_step(rng):
    B, H, W = 2, 12, 16
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 10.0, 12.0, W / 2, H / 2
    Kb = jnp.asarray(np.stack([K] * B))
    invKb = jnp.asarray(np.stack([np.linalg.pinv(K)] * B))
    depth = jnp.asarray(rng.rand(B, H, W).astype(np.float32) * 5 + 1.0)
    axis = jnp.asarray(rng.randn(B, 3).astype(np.float32) * 0.05)
    trans = jnp.asarray(rng.randn(B, 3).astype(np.float32) * 0.1)
    T = G.transformation_from_parameters(axis, trans)
    two_step = G.project_3d(G.backproject_depth(depth, invKb), Kb, T, H, W)
    fused = G.reproject_coords(depth, invKb, Kb, T)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(two_step), atol=1e-4)
