"""Executable-reference oracle for the DynamicDepth cost volume
(`match_features_dyn`, /root/reference/ppeadepth/networks/
replk_matching_adapter.py:163-258) vs ops/cost_volume.
plane_sweep_cost_volume_dyn.

F=1 (the only configuration the reference ever ran — the dyn path is
the CityScapes stage-2 recipe with num_matching_frames 1): every mode
(plain average, cv_min, set_1 in-fill, pool in-fill, augmentation
gating) is driven through the reference's ACTUAL method, bound to a
SimpleNamespace, and compared elementwise.

F=2: the reference's own multi-frame path is latently broken — it
builds the occlusion-mask stack from the [B*F, 3, H, W] reshaped
lookup images (:166) but indexes it `occ_batch[batch_idx]` with
batch_idx < B (:171), so sample b's in-fill reads the mask of stack row
b = (b//F, b%F), conflating batch and frame — and reuses that single
mask for every lookup frame. Our implementation gives each frame its
own mask, so the F=2 expectation here is RECONSTRUCTED from two F=1
reference runs (per-frame in-filled diffs, then the reference's
min/average combination rules) — the composition the reference's
per-frame loop body defines, with the indexing corrected.

The reference also hardcodes 96 depth bins (`repeat([96, ...])`, :200)
— its dyn path CRASHES for any other num_depth_bins — so every case
here runs D=96 to execute its code unmodified.
"""

from __future__ import annotations

import types
from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ppeadepth_tpu.ops import cost_volume as CV
from tests.ref_shims import load_reference

B, Fh, Fw, C = 2, 64, 96, 8   # full-res lookup images [B,F,64,96,3]
h, w = 16, 24                 # matching resolution
D = 96                        # hardcoded in the reference (:200)


@pytest.fixture(scope="module")
def ref_nets():
    return load_reference()


def _make_matcher_ns(bins_np, set_missing_to_max=True):
    import ppeadepth.layers as RL
    from ppeadepth.networks.replk_matching_adapter import RepLKMatchingAdapter

    ns = SimpleNamespace()
    ns.num_depth_bins = D
    ns.matching_height, ns.matching_width = h, w
    ns.backprojector = RL.BackprojectDepth(D, h, w)
    ns.projector = RL.Project3D(D, h, w)
    ns.depth_bins = torch.from_numpy(np.asarray(bins_np, np.float32))
    ns.warp_depths = torch.stack(
        [torch.ones(1, h, w) * d for d in ns.depth_bins], 0).float()
    ns.set_missing_to_max = set_missing_to_max
    ns.match_features_dyn = types.MethodType(
        RepLKMatchingAdapter.match_features_dyn, ns)
    return ns


def _case(rng, F_, aug=(0.0, 0.0)):
    """Non-degenerate poses/intrinsics (knife-edge mask ties round
    differently per backend — CLAUDE.md); lookup images with black
    (DOMD-occluded) rectangles."""
    cur = rng.rand(B, h, w, C).astype(np.float32) * 0.6
    lk = rng.rand(B, F_, h, w, C).astype(np.float32) * 0.6
    imgs = rng.rand(B, F_, Fh, Fw, 3).astype(np.float32) * 0.8 + 0.15
    # black occlusion rectangles, different per (sample, frame)
    for b in range(B):
        for f in range(F_):
            y0 = 8 + 11 * b + 5 * f
            x0 = 20 + 9 * b + 13 * f
            imgs[b, f, y0:y0 + 18, x0:x0 + 25] = 0.0
    poses = np.tile(np.eye(4, dtype=np.float32), (B, F_, 1, 1))
    for b in range(B):
        for f in range(F_):
            s = 1 + 0.3 * b - 0.2 * f
            poses[b, f, :3, 3] = [0.11 * s, 0.017 * s, -0.06 * s]
            th = 0.02 * s
            poses[b, f, 0, 0] = poses[b, f, 1, 1] = np.cos(th)
            poses[b, f, 0, 1], poses[b, f, 1, 0] = -np.sin(th), np.sin(th)
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1] = 0.58 * w, 1.92 * h
    K[0, 2], K[1, 2] = 0.5 * w + 0.31, 0.5 * h - 0.17
    Ks = np.tile(K, (B, 1, 1))
    invKs = np.tile(np.linalg.pinv(K), (B, 1, 1))
    aug_mask = np.asarray(aug, np.float32).reshape(B, 1, 1, 1)
    bins = np.asarray(CV.compute_depth_bins(0.5, 12.0, D, "log"))
    return cur, lk, imgs, poses, Ks, invKs, aug_mask, bins


def _run_ref(ns, cur, lk, imgs, poses, Ks, invKs, aug_mask, cv_min,
             set_1, pool, pool_r=1, pool_th=0.7):
    """Drive the reference method; images are passed reshaped
    [B*F, 3, H, W] exactly as its forward does (:431-432)."""
    F_ = lk.shape[1]
    cur_t = torch.from_numpy(cur.transpose(0, 3, 1, 2).copy())
    lk_t = torch.from_numpy(lk.transpose(0, 1, 4, 2, 3).copy())
    imgs_t = torch.from_numpy(
        imgs.transpose(0, 1, 4, 2, 3).reshape(B * F_, 3, Fh, Fw).copy())
    with torch.no_grad():
        cost, missing = ns.match_features_dyn(
            cur_t, lk_t, torch.from_numpy(poses.copy()),
            torch.from_numpy(Ks.copy()), torch.from_numpy(invKs.copy()),
            imgs_t, cv_min=cv_min,
            aug_mask=torch.from_numpy(aug_mask.copy()),
            set_1=set_1, pool=pool, pool_r=pool_r, pool_th=pool_th)
    return np.asarray(cost), np.asarray(missing)


def _run_ours(cur, lk, imgs, poses, Ks, invKs, aug_mask, bins, cv_min,
              set_1, pool, pool_r=1, pool_th=0.7, set_missing_to_max=True):
    cost, missing = CV.plane_sweep_cost_volume_dyn(
        jnp.asarray(cur), jnp.asarray(lk), jnp.asarray(poses),
        jnp.asarray(Ks), jnp.asarray(invKs), jnp.asarray(bins),
        jnp.asarray(imgs), jnp.asarray(aug_mask),
        cv_min=cv_min, set_1=set_1, pool=pool, pool_r=pool_r,
        pool_th=pool_th, set_missing_to_max=set_missing_to_max)
    return np.asarray(cost), np.asarray(missing)


@pytest.mark.parametrize("cv_min,set_1,pool", [
    (False, False, False),   # plain per-frame average
    (False, True, False),    # set_1 in-fill
    (False, False, True),    # 3D max-pool in-fill
    (True, False, True),     # DynamicDepth headline: cv_min + pool
    (True, True, False),     # cv_min + set_1
])
def test_dyn_single_frame_matches_reference(ref_nets, rng, cv_min, set_1,
                                            pool):
    cur, lk, imgs, poses, Ks, invKs, aug_mask, bins = _case(rng, 1)
    ns = _make_matcher_ns(bins)
    ct, mt = _run_ref(ns, cur, lk, imgs, poses, Ks, invKs, aug_mask,
                      cv_min, set_1, pool)
    cj, mj = _run_ours(cur, lk, imgs, poses, Ks, invKs, aug_mask, bins,
                       cv_min, set_1, pool)
    np.testing.assert_allclose(cj, ct, rtol=1e-5, atol=2e-6)
    np.testing.assert_array_equal(mj, mt)


def test_dyn_augmentation_gating_matches_reference(ref_nets, rng):
    """Sample 0 augmented (in-fill skipped, :199), sample 1 not."""
    cur, lk, imgs, poses, Ks, invKs, aug_mask, bins = _case(
        rng, 1, aug=(1.0, 0.0))
    ns = _make_matcher_ns(bins)
    ct, _ = _run_ref(ns, cur, lk, imgs, poses, Ks, invKs, aug_mask,
                     False, True, False)
    cj, _ = _run_ours(cur, lk, imgs, poses, Ks, invKs, aug_mask, bins,
                      False, True, False)
    np.testing.assert_allclose(cj, ct, rtol=1e-5, atol=2e-6)
    # and the gate had an effect: sample 0 differs from its in-filled form
    cj_fill, _ = _run_ours(cur, lk, imgs, poses, Ks, invKs,
                           np.zeros_like(aug_mask), bins, False, True,
                           False)
    assert not np.allclose(cj[0], cj_fill[0])
    np.testing.assert_allclose(cj[1], cj_fill[1])


@pytest.mark.parametrize("cv_min", [False, True])
def test_dyn_two_frames_compose_per_frame(ref_nets, rng, cv_min):
    """F=2 against the reconstruction from two corrected-indexing F=1
    reference runs (see module docstring).

    average mode: per-frame diffs d_f recovered from each F=1 run via
      d_f = cost_f * (observed_f + 1e-7), combined = sum d / sum c;
    cv_min mode: the per-frame 1.0-sentinel clamp commutes with the
      cross-frame min, so combined = min over frames of cost_f with 0
      treated as +inf (then +inf -> 0)."""
    cur, lk, imgs, poses, Ks, invKs, aug_mask, bins = _case(rng, 2)
    pool_kw = dict(set_1=False, pool=True)

    # reference, one F=1 run per frame with ITS OWN image/pose/feats
    per_frame = []
    for f in range(2):
        ns = _make_matcher_ns(bins, set_missing_to_max=False)
        cf, mf = _run_ref(ns, cur, lk[:, f:f + 1], imgs[:, f:f + 1],
                          poses[:, f:f + 1], Ks, invKs, aug_mask,
                          cv_min, pool_kw["set_1"], pool_kw["pool"])
        per_frame.append((cf, mf))

    if cv_min:
        stack = np.stack([np.where(c == 0, np.inf, c)
                          for c, _ in per_frame])
        expected = stack.min(axis=0)
        expected = np.where(np.isinf(expected), 0.0, expected)
    else:
        dsum = np.zeros_like(per_frame[0][0])
        csum = np.zeros_like(per_frame[0][0])
        for c, m in per_frame:
            obs = 1.0 - m
            dsum += c * (obs + 1e-7)
            csum += obs
        expected = dsum / (csum + 1e-7)

    cj, mj = _run_ours(cur, lk, imgs, poses, Ks, invKs, aug_mask, bins,
                       cv_min, pool_kw["set_1"], pool_kw["pool"],
                       set_missing_to_max=False)
    np.testing.assert_allclose(cj, expected, rtol=1e-5, atol=2e-6)
    # both frames contributed: F=2 differs from either single frame
    for c, _ in per_frame:
        assert not np.allclose(cj, c)
