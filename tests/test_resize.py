"""Resize parity with torch F.interpolate for the cases the model uses."""

import numpy as np
import jax.numpy as jnp
import pytest

from ppeadepth_tpu.ops import resize as R

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _t(x):
    return torch.from_numpy(x.transpose(0, 3, 1, 2))


def _n(t):
    return t.permute(0, 2, 3, 1).numpy()


def test_upsample2x_nearest_parity(rng):
    x = rng.rand(2, 6, 9, 4).astype(np.float32)
    ours = np.asarray(R.upsample2x_nearest(jnp.asarray(x)))
    ref = _n(F.interpolate(_t(x), scale_factor=2, mode="nearest"))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("factor", [2, 4, 8])
def test_resize_nearest_integer_upscale_parity(rng, factor):
    x = rng.rand(1, 6, 10, 3).astype(np.float32)
    ours = np.asarray(
        R.resize_nearest(jnp.asarray(x), 6 * factor, 10 * factor)
    )
    ref = _n(F.interpolate(_t(x), scale_factor=factor, mode="nearest"))
    np.testing.assert_array_equal(ours, ref)


def test_resize_nearest_integer_downscale_parity(rng):
    # lowest_cost H/4 -> H is upscale; also verify a 4x downscale case
    x = rng.rand(1, 32, 48, 1).astype(np.float32)
    ours = np.asarray(R.resize_nearest(jnp.asarray(x), 8, 12))
    ref = _n(F.interpolate(_t(x), size=(8, 12), mode="nearest"))
    np.testing.assert_array_equal(ours, ref)


def test_resize_bilinear_parity(rng):
    # disp upsample to full res: bilinear align_corners=False
    x = rng.rand(2, 48, 160, 1).astype(np.float32)
    ours = np.asarray(R.resize_bilinear(jnp.asarray(x), 192, 640))
    ref = _n(F.interpolate(_t(x), size=(192, 640), mode="bilinear",
                           align_corners=False))
    np.testing.assert_allclose(ours, ref, atol=2e-6)
