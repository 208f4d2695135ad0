"""Cost volume tests: synthetic-plane recovery + brute-force equivalence."""

import numpy as np
import jax.numpy as jnp

from ppeadepth_tpu.ops import cost_volume as CV
from ppeadepth_tpu.ops.sampling import grid_sample
from ppeadepth_tpu.core import geometry as G


def _camera(H, W, fx=60.0, fy=60.0):
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1] = fx, fy
    K[0, 2], K[1, 2] = W / 2.0, H / 2.0
    return K


def test_depth_bins_log_spacing():
    bins = np.asarray(CV.compute_depth_bins(0.1, 20.0, 96, "log"))
    assert bins.shape == (96,)
    np.testing.assert_allclose(bins[0], 0.1, rtol=1e-4)
    assert bins[-1] < 20.0  # reference uses i/N so max bin is below max depth
    ratios = bins[1:] / bins[:-1]
    np.testing.assert_allclose(ratios, ratios[0], rtol=1e-4)


def test_depth_bins_all_modes_match_reference_formulas():
    """Pin linear/inverse/log against replk_matching.py:96-114 and assert
    ascending depth order (the reference reverses 'inverse' explicitly:
    "maintain depth order"). Round 3 shipped inverse DESCENDING
    ([::-1][::-1] no-op); this is the regression test for the fix."""
    mn, mx, N = 0.5, 20.0, 17
    for mode, ref in {
        "linear": np.linspace(mn, mx, N),
        "inverse": 1.0 / np.linspace(1.0 / mx, 1.0 / mn, N)[::-1],
        "log": np.exp(np.log(mn) + np.log(mx / mn) * np.arange(N) / N),
    }.items():
        got = np.asarray(CV.compute_depth_bins(mn, mx, N, mode))
        np.testing.assert_allclose(got, ref.astype(np.float32), rtol=1e-5,
                                   err_msg=mode)
        assert (np.diff(got) > 0).all(), f"{mode} bins must ascend"


def test_plane_recovery(rng):
    """Fronto-parallel plane at depth d with pure x-translation: the argmin
    bin must be the hypothesis closest to d for interior pixels."""
    H, W, C = 32, 48, 8
    fx, tx, d_true = 60.0, 0.5, 10.0
    shift = int(round(fx * tx / d_true))  # 3 px

    base = rng.rand(H, W + shift, C).astype(np.float32)
    # smooth horizontally so bilinear interpolation is well-behaved
    for _ in range(3):
        base = 0.5 * base + 0.25 * np.roll(base, 1, 1) + 0.25 * np.roll(base, -1, 1)
    cur = base[:, shift:, :]
    lk = base[:, :-shift, :]  # lookup(u) = current(u - shift)

    K = _camera(H, W, fx)
    invK = np.linalg.pinv(K)
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = tx

    bins = CV.compute_depth_bins(5.0, 20.0, 32, "log")
    cost, missing = CV.plane_sweep_cost_volume(
        jnp.asarray(cur[None]),
        jnp.asarray(lk[None, None]),
        jnp.asarray(T[None, None]),
        jnp.asarray(K[None]),
        jnp.asarray(invK[None]),
        bins,
        bin_chunk=8,
    )
    cost = np.asarray(cost)[0]  # [D, H, W]
    bins_np = np.asarray(bins)
    true_bin = int(np.argmin(np.abs(bins_np - d_true)))
    argmin = cost.argmin(0)
    interior = argmin[6:-6, 6:-6]
    frac = np.mean(np.abs(interior - true_bin) <= 1)
    assert frac > 0.9, f"only {frac:.2%} of pixels matched bin {true_bin}"


def _brute_force(cur, lks, poses, K, invK, bins):
    """Straightforward per-sample/per-bin recomputation of the documented
    semantics, vectorization-free, using the parity-tested grid_sample."""
    B, H, W, C = cur.shape
    F_ = lks.shape[1]
    D = len(bins)
    cost = np.zeros((B, D, H, W), np.float32)
    counts = np.zeros((B, D, H, W), np.float32)
    for b in range(B):
        for f in range(F_):
            if np.abs(poses[b, f]).sum() == 0:
                continue
            for di, d in enumerate(bins):
                depth = jnp.full((1, H, W), float(d))
                coords = G.reproject_coords(
                    depth, jnp.asarray(invK[None, b]), jnp.asarray(K[None, b]),
                    jnp.asarray(poses[None, b, f]),
                )
                warped = np.asarray(
                    grid_sample(jnp.asarray(lks[None, b, f]), coords, "zeros")
                )[0]
                x = (np.asarray(coords)[0, ..., 0] / 2 + 0.5) * (W - 1)
                y = (np.asarray(coords)[0, ..., 1] / 2 + 0.5) * (H - 1)
                edge = (
                    (x >= 2.0) & (x <= W - 2) & (y >= 2.0) & (y <= H - 2)
                ).astype(np.float32)
                cmask = np.zeros((H, W), np.float32)
                cmask[2:-2, 2:-2] = 1.0
                diff = np.abs(warped - cur[b]).mean(-1) * edge * cmask
                cost[b, di] += diff
                counts[b, di] += (diff > 0).astype(np.float32)
    cost = cost / (counts + 1e-7)
    missing = (cost == 0).astype(np.float32)
    cost = cost * (1 - missing) + cost.max(1, keepdims=True) * missing
    return cost, missing


def test_matches_brute_force(rng):
    B, F_, H, W, C, D = 2, 2, 12, 16, 4, 6
    cur = rng.rand(B, H, W, C).astype(np.float32)
    lks = rng.rand(B, F_, H, W, C).astype(np.float32)
    K = _camera(H, W, fx=10.0, fy=10.0)
    Ks = np.stack([K] * B)
    invKs = np.stack([np.linalg.pinv(K)] * B)
    poses = np.stack(
        [
            np.asarray(
                G.transformation_from_parameters(
                    jnp.asarray(rng.randn(F_, 3).astype(np.float32) * 0.05),
                    jnp.asarray(rng.randn(F_, 3).astype(np.float32) * 0.2),
                )
            )
            for _ in range(B)
        ]
    )
    poses[1, 1] = 0.0  # a missing frame

    bins = np.asarray(CV.compute_depth_bins(2.0, 20.0, D, "log"))
    ours_cost, ours_missing = CV.plane_sweep_cost_volume(
        jnp.asarray(cur), jnp.asarray(lks), jnp.asarray(poses),
        jnp.asarray(Ks), jnp.asarray(invKs), jnp.asarray(bins), bin_chunk=3,
    )
    ref_cost, ref_missing = _brute_force(cur, lks, poses, Ks, invKs, bins)
    np.testing.assert_allclose(np.asarray(ours_cost), ref_cost, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours_missing), ref_missing, atol=1e-6)

    conf = np.asarray(CV.confidence_mask(ours_cost, ours_missing))
    assert conf.shape == (B, H, W)
    assert set(np.unique(conf)).issubset({0.0, 1.0})

    lc = np.asarray(CV.lowest_cost_disparity(ours_cost, jnp.asarray(bins)))
    assert lc.shape == (B, H, W)
    assert np.all(lc >= 1 / bins[-1] - 1e-6) and np.all(lc <= 1 / bins[0] + 1e-6)
