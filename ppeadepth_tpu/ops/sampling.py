"""Bilinear grid sampling with exact `F.grid_sample` parity (NHWC).

The reference warps images with torch.nn.functional.grid_sample using
align_corners=True and either padding_mode="border" (photometric warp,
trainer.py:904-914) or "zeros" (cost-volume feature warp,
replk_matching.py:163-165). Off-by-half-pixel differences silently destroy
AbsRel, so this module reproduces torch semantics bit-for-bit (verified in
tests/test_sampling.py against torch CPU) while staying a pure gather-based
jax function that XLA lays out efficiently on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord, size):
    """align_corners=True: [-1, 1] -> [0, size-1]."""
    return (coord + 1.0) * 0.5 * (size - 1)


def grid_sample(img, grid, padding_mode="border"):
    """Bilinear sample `img` (NHWC) at normalized `grid` locations.

    img:  [B, H, W, C]
    grid: [B, Ho, Wo, 2], last axis (x, y) in [-1, 1], align_corners=True.
    padding_mode: "border" | "zeros" (torch parity for both).

    Returns [B, Ho, Wo, C].
    """
    B, H, W, C = img.shape
    x = _unnormalize(grid[..., 0], W)
    y = _unnormalize(grid[..., 1], H)

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)
    elif padding_mode != "zeros":
        raise ValueError(f"unsupported padding_mode: {padding_mode}")

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    def gather(yi, xi):
        # clamp for safe gathering; zeros mode masks the contribution below
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        flat = (yc * W + xc).reshape(B, -1)  # [B, Ho*Wo]
        g = jnp.take_along_axis(
            img.reshape(B, H * W, C), flat[..., None], axis=1
        )
        return g.reshape(B, *grid.shape[1:3], C)

    def valid(yi, xi):
        return (
            (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        ).astype(img.dtype)[..., None]

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)

    w00 = ((1 - wx) * (1 - wy))[..., None]
    w01 = (wx * (1 - wy))[..., None]
    w10 = ((1 - wx) * wy)[..., None]
    w11 = (wx * wy)[..., None]

    if padding_mode == "zeros":
        w00 = w00 * valid(y0i, x0i)
        w01 = w01 * valid(y0i, x1i)
        w10 = w10 * valid(y1i, x0i)
        w11 = w11 * valid(y1i, x1i)

    return v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11
