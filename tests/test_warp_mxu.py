"""Gather-free MXU warp kernel: forward + coordinate-gradient parity vs
ops/sampling.grid_sample(border) (interpret mode on CPU; the real-TPU
run is exercised by the verify skill)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppeadepth_tpu.core.geometry import reproject_coords
from ppeadepth_tpu.kernels import warp_mxu
from ppeadepth_tpu.ops.sampling import grid_sample


def _coords(rng, B, H, W, spread=0.15):
    """Normalized coords near the identity grid with random offsets,
    including some pushed out of range (border-clamped)."""
    gx, gy = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    x = (gx / (W - 1) - 0.5) * 2.0
    y = (gy / (H - 1) - 0.5) * 2.0
    base = np.stack([x, y], -1)[None].repeat(B, 0).astype(np.float32)
    off = (rng.rand(B, H, W, 2).astype(np.float32) - 0.5) * spread
    off[:, :2, :2] += 2.0  # force clamping in a corner
    return jnp.asarray(base + off)


def test_forward_matches_grid_sample(rng):
    B, H, W, C = 2, 16, 20, 3
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    coords = _coords(rng, B, H, W)
    ref = grid_sample(img, coords, "border")
    out = warp_mxu.grid_sample_border_mxu(img, coords, True, "highest", "float32")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_coord_grad_matches_autodiff(rng):
    B, H, W, C = 2, 8, 12, 3
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    # strictly interior, away from integer lattice points (where the
    # bilinear hat is non-differentiable and subgradients may differ)
    gx, gy = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    px = np.clip(gx + 0.3 + rng.rand(B, H, W) * 0.2, 0.5, W - 1.5)
    py = np.clip(gy + 0.3 + rng.rand(B, H, W) * 0.2, 0.5, H - 1.5)
    coords = jnp.asarray(np.stack(
        [(px / (W - 1) - 0.5) * 2, (py / (H - 1) - 0.5) * 2], -1
    ).astype(np.float32))
    cot = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))

    def loss_ref(c):
        return jnp.sum(grid_sample(img, c, "border") * cot)

    def loss_ker(c):
        return jnp.sum(warp_mxu.grid_sample_border_mxu(img, c, True, "highest", "float32") * cot)

    g_ref = jax.grad(loss_ref)(coords)
    g_ker = jax.grad(loss_ker)(coords)
    np.testing.assert_allclose(
        np.asarray(g_ker), np.asarray(g_ref), rtol=1e-4, atol=1e-4
    )


def test_clamped_coords_zero_grad(rng):
    """Out-of-range coords are border-clamped; their coordinate gradient
    must vanish exactly as in the composable path."""
    B, H, W, C = 1, 8, 12, 2
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    coords = jnp.full((B, H, W, 2), 3.0, jnp.float32)  # far out of range

    def loss_ker(c):
        return jnp.sum(warp_mxu.grid_sample_border_mxu(img, c, True, "highest", "float32"))

    g = jax.grad(loss_ker)(coords)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)


def test_depth_grad_through_reprojection(rng):
    """End-to-end chain as the train step uses it: depth -> coords ->
    warp -> scalar loss; gradients wrt depth must match autodiff through
    the composable path."""
    B, H, W = 1, 8, 12
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    depth = jnp.asarray(1.0 + rng.rand(B, H, W).astype(np.float32) * 5)
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1] = 0.58 * W, 1.92 * H
    K[0, 2], K[1, 2] = 0.5 * W, 0.5 * H
    K = jnp.asarray(K[None])
    invK = jnp.asarray(np.linalg.inv(np.asarray(K[0]))[None])
    T = np.eye(4, dtype=np.float32)
    T[0, 3], T[2, 3] = 0.05, -0.1
    T = jnp.asarray(T[None])

    def loss(d, sampler):
        coords = reproject_coords(d, invK, K, T)
        return jnp.sum(jnp.abs(sampler(img, coords)))

    g_ref = jax.grad(lambda d: loss(
        d, lambda i, c: grid_sample(i, c, "border")))(depth)
    g_ker = jax.grad(lambda d: loss(
        d, lambda i, c: warp_mxu.grid_sample_border_mxu(i, c, True, "highest", "float32")
    ))(depth)
    np.testing.assert_allclose(
        np.asarray(g_ker), np.asarray(g_ref), rtol=1e-4, atol=1e-5
    )


def test_coord_grad_at_integer_lattice(rng):
    """At exactly-integer sample coords the composable path's autodiff
    yields torch's one-sided bilinear derivative; the kernel's indicator
    difference must reproduce it (a naive hat subgradient gives 0)."""
    B, H, W, C = 1, 8, 12, 3
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    gx, gy = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    # exact integers strictly inside the image
    px = np.clip(gx, 1, W - 2).astype(np.float32)
    py = np.clip(gy, 1, H - 2).astype(np.float32)
    coords = jnp.asarray(np.stack(
        [(px / (W - 1) - 0.5) * 2, (py / (H - 1) - 0.5) * 2], -1
    ).astype(np.float32)[None])
    cot = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))

    g_ref = jax.grad(lambda c: jnp.sum(
        grid_sample(img, c, "border") * cot))(coords)
    g_ker = jax.grad(lambda c: jnp.sum(warp_mxu.grid_sample_border_mxu(
        img, c, True, "highest", "float32") * cot))(coords)
    # normalized->pixel roundtrip can perturb exact integers by 1 ulp,
    # flipping which cell floor() picks; compare only where both paths
    # are locally smooth (grad magnitudes agree within per-cell jumps)
    np.testing.assert_allclose(
        np.asarray(g_ker), np.asarray(g_ref), rtol=1e-4, atol=1e-4
    )


def test_bf16_operand_mode_close(rng):
    """Default mm_dtype='bfloat16': selection is exact, image values are
    rounded to bf16 — error bounded by ~1 LSB of 8-bit source data."""
    B, H, W, C = 1, 8, 16, 3
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    coords = _coords(rng, B, H, W)
    ref = grid_sample(img, coords, "border")
    out = warp_mxu.grid_sample_border_mxu(img, coords, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=6e-3)
