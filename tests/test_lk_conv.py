"""Pallas depthwise conv: equivalence vs the lax path (interpret mode on
CPU; the real-TPU run is exercised by bench/verify)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppeadepth_tpu.kernels import lk_conv


@pytest.mark.parametrize("k", [5, 13, 31])
def test_pallas_matches_lax(rng, k):
    from ppeadepth_tpu.kernels import lk_conv_pallas as P
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = 2, 16, 24, 8
    x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, 1, C).astype(np.float32) * 0.1)

    ref = lk_conv._depthwise_lax(x, w, 1, k // 2)
    with pltpu.force_tpu_interpret_mode():
        out = P.depthwise_conv2d_pallas(x, w, k // 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_backend_switch(rng):
    x = jnp.asarray(rng.rand(1, 8, 8, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 1, 4).astype(np.float32))
    lk_conv.set_backend("lax")
    y = lk_conv.depthwise_conv2d(x, w)
    assert y.shape == x.shape
