"""Bit-level parity of ops.sampling.grid_sample with torch F.grid_sample."""

import numpy as np
import jax.numpy as jnp
import pytest

from ppeadepth_tpu.ops.sampling import grid_sample

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize("padding", ["border", "zeros"])
def test_grid_sample_parity(rng, padding):
    B, H, W, C = 2, 9, 13, 4
    img = rng.rand(B, H, W, C).astype(np.float32)
    # include far out-of-range coords to exercise padding
    grid = (rng.rand(B, 7, 11, 2).astype(np.float32) * 3.0) - 1.5

    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid), padding))

    timg = torch.from_numpy(img).permute(0, 3, 1, 2)
    tgrid = torch.from_numpy(grid)
    ref = F.grid_sample(
        timg, tgrid, mode="bilinear", padding_mode=padding, align_corners=True
    ).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_grid_sample_identity(rng):
    B, H, W, C = 1, 8, 10, 3
    img = rng.rand(B, H, W, C).astype(np.float32)
    gx, gy = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    grid = np.stack(
        [(gx / (W - 1) - 0.5) * 2, (gy / (H - 1) - 0.5) * 2], -1
    ).astype(np.float32)[None]
    out = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(out, img, atol=1e-5)
