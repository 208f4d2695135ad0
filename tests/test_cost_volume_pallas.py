"""Experimental pallas cost-volume kernel: interpret-mode equivalence
against the production XLA _frame_diffs path."""

import jax
import jax.numpy as jnp
import numpy as np

from ppeadepth_tpu.core.geometry import transformation_from_parameters
from ppeadepth_tpu.kernels.cost_volume_pallas import frame_diffs_pallas
from ppeadepth_tpu.ops import cost_volume as CV

_HI = jax.lax.Precision.HIGHEST


def test_frame_diffs_equivalence(rng):
    B, H, W, C, D = 2, 16, 24, 8, 6
    cur = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    lk = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 10.0, 10.0, W / 2, H / 2
    Ks = jnp.asarray(np.stack([K] * B))
    invKs = jnp.asarray(np.stack([np.linalg.pinv(K)] * B))
    T = transformation_from_parameters(
        jnp.asarray(rng.randn(B, 3).astype(np.float32) * 0.03),
        jnp.asarray(rng.randn(B, 3).astype(np.float32) * 0.2),
    )
    bins = CV.compute_depth_bins(2.0, 15.0, D)

    P = jnp.matmul(Ks, T, precision=_HI)[:, :3, :]
    A = jnp.matmul(P[:, :, :3], invKs[:, :3, :3], precision=_HI)
    t = P[:, :, 3]

    ours = frame_diffs_pallas(cur, lk, A, t, bins, interpret=True)

    ref = jax.vmap(
        lambda cf, lf, a, tt: CV._frame_diffs(
            cf, lf, a, tt, bins, H, W, bin_chunk=3
        )
    )(cur.reshape(B, H * W, C), lk, A, t)

    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)
