"""Resize ops with torch `F.interpolate` parity for the cases the model uses.

Usage sites in the reference:
  - nearest 2x upsample in the depth decoder (layers.py:204-207);
  - nearest 8x upsample of deep features for decoder adapters
    (depth_decoder_v2.py:181);
  - nearest resize of lowest_cost / consistency_mask to full res
    (repdepth.py:615-620);
  - bilinear (align_corners=False) resize of disparity to full res
    (trainer.py:888-890).

For integer scale factors torch's nearest (floor(i * in/out)) and jax's
half-pixel nearest agree exactly, so `jax.image.resize(method="nearest")`
is safe here; the hot 2x path uses an explicit repeat which XLA fuses.
torch bilinear align_corners=False uses half-pixel centers, identical to
`jax.image.resize(method="linear")`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def upsample2x_nearest(x):
    """Nearest 2x upsample of NHWC (exact repeat; matches F.interpolate)."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)


def resize_nearest(x, height, width):
    """Nearest resize of NHWC to (height, width).

    Exact torch parity for integer up/down factors (the only uses here).
    """
    B, H, W, C = x.shape
    if height == H and width == W:
        return x
    if height % H == 0 and width % W == 0:
        fh, fw = height // H, width // W
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, fh, W, fw, C))
        return x.reshape(B, height, width, C)
    if H % height == 0 and W % width == 0:
        # integer downscale: torch nearest picks floor(i * in/out), i.e.
        # the first element of each block
        return x[:, :: H // height, :: W // width, :]
    return jax.image.resize(x, (B, height, width, C), method="nearest")


def resize_bilinear(x, height, width):
    """Bilinear (align_corners=False / half-pixel) resize of NHWC."""
    B, H, W, C = x.shape
    if height == H and width == W:
        return x
    return jax.image.resize(x, (B, height, width, C), method="linear")
