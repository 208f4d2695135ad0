"""Equivalence tests for the gather-free MXU plane-sweep kernel
(kernels/cost_volume_mxu.py) against the production XLA path
(ops/cost_volume.py) — interpret mode on CPU; the compiled kernel is
exercised on TPU by the train-step benchmark.

Reference semantics: replk_matching.py:127-206.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppeadepth_tpu.kernels.cost_volume_mxu import frame_diffs_batch
from ppeadepth_tpu.ops import cost_volume as CV

B, H, W, C, D = 2, 16, 32, 8, 8


def _proj(rng, zero=()):
    """Realistic-ish per-item projection (A, t) pairs."""
    K = np.array([[W * 0.58, 0, W / 2], [0, H * 1.92, H / 2], [0, 0, 1]],
                 np.float32)
    A = np.zeros((B, 3, 3), np.float32)
    t = np.zeros((B, 3), np.float32)
    for b in range(B):
        if b in zero:
            continue  # all-zero pose (missing frame protocol)
        th = rng.randn(3) * 0.03
        c, s = np.cos(th), np.sin(th)
        Rz = np.array([[c[2], -s[2], 0], [s[2], c[2], 0], [0, 0, 1]])
        Ry = np.array([[c[1], 0, s[1]], [0, 1, 0], [-s[1], 0, c[1]]])
        Rx = np.array([[1, 0, 0], [0, c[0], -s[0]], [0, s[0], c[0]]])
        R = (Rz @ Ry @ Rx).astype(np.float32)
        A[b] = K @ R @ np.linalg.inv(K)
        t[b] = K @ (rng.randn(3) * np.array([0.3, 0.1, 1.0])).astype(
            np.float32)
    return jnp.asarray(A), jnp.asarray(t)


@pytest.fixture(scope="module")
def data():
    k = jax.random.PRNGKey(42)
    cur = jax.random.normal(k, (B, H * W, C), jnp.float32)
    lk = jax.random.normal(jax.random.fold_in(k, 1), (B, H, W, C),
                           jnp.float32)
    bins = CV.compute_depth_bins(2.0, 40.0, D)
    return cur, lk, bins


def test_frame_diffs_matches_xla_path(data):
    cur, lk, bins = data
    A, t = _proj(np.random.RandomState(0))
    ref = jax.vmap(
        lambda cf, lf, a, tt: CV._frame_diffs(cf, lf, a, tt, bins, H, W, D)
    )(cur, lk, A, t)
    out = frame_diffs_batch(cur, lk, A, t, bins, interpret=True,
                            precision="highest", compute_dtype="float32")
    assert out.shape == (B, D, H, W)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)
    # the epipolar sweep must actually observe pixels
    assert float(jnp.mean(ref > 0)) > 0.1


def test_frame_diffs_bf16_operands_close(data):
    cur, lk, bins = data
    A, t = _proj(np.random.RandomState(1))
    ref = jax.vmap(
        lambda cf, lf, a, tt: CV._frame_diffs(cf, lf, a, tt, bins, H, W, D)
    )(cur, lk, A, t)
    out = frame_diffs_batch(cur, lk, A, t, bins, interpret=True)
    # bf16 matmul operands: ~0.3% relative error on O(1) costs
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 2e-2, err


def test_zero_pose_gives_zero_diffs(data):
    cur, lk, bins = data
    A, t = _proj(np.random.RandomState(2), zero=(0,))
    out = frame_diffs_batch(cur, lk, A, t, bins, interpret=True)
    assert float(jnp.max(jnp.abs(out[0]))) == 0.0
    assert float(jnp.max(out[1])) > 0.0


def test_plane_sweep_backend_equivalence(data):
    cur, lk, bins = data
    k = jax.random.PRNGKey(7)
    T = jnp.tile(jnp.eye(4)[None, None], (B, 1, 1, 1))
    T = T.at[:, 0, :3, 3].set(jax.random.normal(k, (B, 3)) * 0.3)
    T = T.at[1].set(0.0)  # frame skipped for item 1
    K4 = jnp.tile(jnp.eye(4)[None], (B, 1, 1))
    K4 = K4.at[:, 0, 0].set(W * 0.58).at[:, 1, 1].set(H * 1.92)
    K4 = K4.at[:, 0, 2].set(W / 2).at[:, 1, 2].set(H / 2)
    invK4 = jnp.linalg.inv(K4)
    cur4 = cur.reshape(B, H, W, C)
    lk5 = lk[:, None]
    ref_cost, ref_miss = CV.plane_sweep_cost_volume(
        cur4, lk5, T, K4, invK4, bins, backend="lax")
    out_cost, out_miss = CV.plane_sweep_cost_volume(
        cur4, lk5, T, K4, invK4, bins, backend="mxu")
    np.testing.assert_allclose(np.asarray(out_miss), np.asarray(ref_miss))
    np.testing.assert_allclose(np.asarray(out_cost), np.asarray(ref_cost),
                               atol=2e-2, rtol=2e-2)
    # item 1 saw no frames: everything missing
    assert float(jnp.min(ref_miss[1])) == 1.0


def test_plane_sweep_mxu_f32_exact(data):
    cur, lk, bins = data
    k = jax.random.PRNGKey(9)
    T = jnp.tile(jnp.eye(4)[None, None], (B, 1, 1, 1))
    T = T.at[:, 0, :3, 3].set(jax.random.normal(k, (B, 3)) * 0.3)
    K4 = jnp.tile(jnp.eye(4)[None], (B, 1, 1))
    K4 = K4.at[:, 0, 0].set(W * 0.58).at[:, 1, 1].set(H * 1.92)
    K4 = K4.at[:, 0, 2].set(W / 2).at[:, 1, 2].set(H / 2)
    invK4 = jnp.linalg.inv(K4)
    ref_cost, _ = CV.plane_sweep_cost_volume(
        cur.reshape(B, H, W, C), lk[:, None], T, K4, invK4, bins,
        backend="lax")
    out_cost, _ = CV.plane_sweep_cost_volume(
        cur.reshape(B, H, W, C), lk[:, None], T, K4, invK4, bins,
        backend="mxu_f32")
    np.testing.assert_allclose(np.asarray(out_cost), np.asarray(ref_cost),
                               atol=5e-4, rtol=5e-4)


def test_resolve_backend():
    assert CV.resolve_cv_backend("lax") == "lax"
    assert CV.resolve_cv_backend("mxu") == "mxu"
    expected = "mxu" if jax.default_backend() == "tpu" else "lax"
    assert CV.resolve_cv_backend("auto") == expected
