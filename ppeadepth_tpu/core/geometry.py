"""Pure-function camera geometry for self-supervised depth.

Semantics match the reference implementation (see ppeadepth/layers.py in the
upstream PPEA-Depth repo: disp_to_depth @ layers.py:14-23, SE3 construction
@ layers.py:26-100, BackprojectDepth @ layers.py:138-168, Project3D
@ layers.py:171-199) but are written as stateless jax functions over NHWC
tensors: there are no precomputed pixel-grid buffers — grids are generated
under jit and folded into constants by XLA.

All functions are batched over a leading batch axis and jit/vmap friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Small-matrix camera math must not be demoted to bf16 on the MXU: an
# off-by-1e-3 projection is an off-by-pixels warp. All matmuls here pin
# float32 accumulation.
_HI = jax.lax.Precision.HIGHEST


def disp_to_depth(disp, min_depth, max_depth):
    """Convert a sigmoid disparity in [0, 1] to (scaled_disp, depth).

    scaled_disp lies in [1/max_depth, 1/min_depth]; depth = 1/scaled_disp.
    Reference: layers.py:14-23.
    """
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    depth = 1.0 / scaled_disp
    return scaled_disp, depth


def rot_from_axisangle(vec):
    """Axis-angle (Rodrigues) -> 4x4 rotation matrix.

    vec: [..., 3]. Returns [..., 4, 4]. Reference: layers.py:61-100
    (including the 1e-7 axis-normalisation epsilon).
    """
    angle = jnp.linalg.norm(vec, axis=-1, keepdims=True)  # [..., 1]
    axis = vec / (angle + 1e-7)

    ca = jnp.cos(angle)[..., 0]
    sa = jnp.sin(angle)[..., 0]
    C = 1.0 - ca

    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]

    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC

    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    rot = jnp.stack(
        [
            x * xC + ca, xyC - zs, zxC + ys, zero,
            xyC + zs, y * yC + ca, yzC - xs, zero,
            zxC - ys, yzC + xs, z * zC + ca, zero,
            zero, zero, zero, one,
        ],
        axis=-1,
    ).reshape(vec.shape[:-1] + (4, 4))
    return rot


def get_translation_matrix(t):
    """Translation vector [..., 3] -> 4x4 matrix. Reference: layers.py:45-58."""
    eye = jnp.broadcast_to(jnp.eye(4, dtype=t.dtype), t.shape[:-1] + (4, 4))
    return eye.at[..., :3, 3].set(t)


def transformation_from_parameters(axisangle, translation, invert=False):
    """(axisangle, translation) -> 4x4 SE3 transform.

    axisangle/translation: [..., 3]. `invert` composes the inverse transform
    exactly as the reference does (transpose R, negate t, swap multiply
    order). Reference: layers.py:26-42.
    """
    R = rot_from_axisangle(axisangle)
    t = translation
    if invert:
        R = jnp.swapaxes(R, -1, -2)
        t = -t
    T = get_translation_matrix(t)
    if invert:
        return jnp.matmul(R, T, precision=_HI)
    return jnp.matmul(T, R, precision=_HI)


def pixel_grid(height, width, dtype=jnp.float32):
    """Homogeneous pixel grid [3, H*W] with rows (x, y, 1).

    Equivalent to the constant buffer of BackprojectDepth
    (layers.py:149-161), generated under jit (XLA constant-folds it).
    """
    xs = jnp.arange(width, dtype=dtype)
    ys = jnp.arange(height, dtype=dtype)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    ones = jnp.ones_like(gx)
    return jnp.stack([gx.reshape(-1), gy.reshape(-1), ones.reshape(-1)], 0)


def backproject_depth(depth, inv_K):
    """Depth map -> homogeneous camera-space point cloud.

    depth: [B, H, W] or [B, H, W, 1]; inv_K: [B, 4, 4].
    Returns [B, 4, H*W]. Reference: layers.py:163-168.
    """
    if depth.ndim == 4:
        depth = depth[..., 0]
    B, H, W = depth.shape
    pix = pixel_grid(H, W, depth.dtype)  # [3, HW]
    cam = jnp.einsum("bij,jn->bin", inv_K[:, :3, :3], pix, precision=_HI)  # [B, 3, HW]
    cam = cam * depth.reshape(B, 1, H * W)
    ones = jnp.ones((B, 1, H * W), depth.dtype)
    return jnp.concatenate([cam, ones], axis=1)


def project_3d(points, K, T, height, width, eps=1e-7, return_depth=False):
    """Project homogeneous 3D points into a camera -> normalized grid coords.

    points: [B, 4, H*W]; K, T: [B, 4, 4].
    Returns pix_coords [B, H, W, 2] in [-1, 1] (grid_sample convention,
    align_corners=True normalisation `(x/(W-1) - 0.5) * 2`).
    Reference: layers.py:184-199.
    """
    P = jnp.matmul(K, T, precision=_HI)[:, :3, :]  # [B, 3, 4]
    cam = jnp.matmul(P, points, precision=_HI)  # [B, 3, HW]
    B = points.shape[0]
    z = cam[:, 2:3, :]
    pix = cam[:, :2, :] / (z + eps)
    pix = pix.reshape(B, 2, height, width).transpose(0, 2, 3, 1)  # [B,H,W,2]
    x = (pix[..., 0] / (width - 1) - 0.5) * 2.0
    y = (pix[..., 1] / (height - 1) - 0.5) * 2.0
    coords = jnp.stack([x, y], axis=-1)
    if return_depth:
        computed_depth = z.reshape(B, height, width, 1)
        return coords, computed_depth
    return coords


def reproject_coords(depth, inv_K, K, T, eps=1e-7):
    """Fused backproject->transform->project for inverse warping.

    depth: [B, H, W(, 1)]; inv_K, K, T: [B, 4, 4].
    Returns normalized sample coords [B, H, W, 2] for `grid_sample`.

    Algebraically identical to project_3d(backproject_depth(...)) but keeps
    the [3,3] composition `A = (K T)[:3,:3] inv_K[:3,:3]` so the per-pixel
    work is a fused multiply-add instead of two big matmuls — the form the
    plane-sweep cost volume also exploits (one A per (batch, frame), then
    coords(d) = base * d + t for every depth plane d).
    """
    if depth.ndim == 4:
        depth = depth[..., 0]
    B, H, W = depth.shape
    pix = pixel_grid(H, W, depth.dtype)  # [3, HW]
    P = jnp.matmul(K, T, precision=_HI)[:, :3, :]  # [B, 3, 4]
    A = jnp.matmul(P[:, :, :3], inv_K[:, :3, :3], precision=_HI)  # [B, 3, 3]
    base = jnp.einsum("bij,jn->bin", A, pix, precision=_HI)  # [B, 3, HW]
    cam = base * depth.reshape(B, 1, H * W) + P[:, :, 3:4]
    z = cam[:, 2:3, :]
    pix2 = cam[:, :2, :] / (z + eps)
    pix2 = pix2.reshape(B, 2, H, W).transpose(0, 2, 3, 1)
    x = (pix2[..., 0] / (W - 1) - 0.5) * 2.0
    y = (pix2[..., 1] / (H - 1) - 0.5) * 2.0
    return jnp.stack([x, y], axis=-1)
