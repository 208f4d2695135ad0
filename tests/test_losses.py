"""Parity of loss primitives with the reference formulas (torch golden)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ppeadepth_tpu.core import losses as L

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402


class _TorchSSIM(nn.Module):
    """Reference SSIM (layers.py:226-257) re-stated for the golden test."""

    def __init__(self):
        super().__init__()
        self.pool = nn.AvgPool2d(3, 1)
        self.refl = nn.ReflectionPad2d(1)
        self.C1 = 0.01 ** 2
        self.C2 = 0.03 ** 2

    def forward(self, x, y):
        x, y = self.refl(x), self.refl(y)
        mu_x, mu_y = self.pool(x), self.pool(y)
        sigma_x = self.pool(x ** 2) - mu_x ** 2
        sigma_y = self.pool(y ** 2) - mu_y ** 2
        sigma_xy = self.pool(x * y) - mu_x * mu_y
        n = (2 * mu_x * mu_y + self.C1) * (2 * sigma_xy + self.C2)
        d = (mu_x ** 2 + mu_y ** 2 + self.C1) * (sigma_x + sigma_y + self.C2)
        return torch.clamp((1 - n / d) / 2, 0, 1)


def test_ssim_parity(rng):
    x = rng.rand(2, 16, 20, 3).astype(np.float32)
    y = rng.rand(2, 16, 20, 3).astype(np.float32)
    ours = np.asarray(L.ssim(jnp.asarray(x), jnp.asarray(y)))
    ref = (
        _TorchSSIM()(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(y).permute(0, 3, 1, 2),
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_reprojection_loss_weights(rng):
    x = rng.rand(1, 12, 12, 3).astype(np.float32)
    y = rng.rand(1, 12, 12, 3).astype(np.float32)
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    full = L.reprojection_loss(xj, yj)
    l1 = L.reprojection_loss(xj, yj, no_ssim=True)
    s = jnp.mean(L.ssim(xj, yj), -1, keepdims=True)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(0.85 * s + 0.15 * l1), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(l1)[..., 0], np.abs(x - y).mean(-1), atol=1e-6
    )


def test_smooth_loss_zero_for_constant():
    disp = jnp.ones((1, 8, 8, 1))
    img = jnp.zeros((1, 8, 8, 3))
    assert float(L.smooth_loss(disp, img)) == 0.0


def test_smooth_loss_edge_weighting(rng):
    disp = jnp.asarray(rng.rand(1, 8, 8, 1).astype(np.float32))
    flat_img = jnp.zeros((1, 8, 8, 3))
    edgy_img = jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32) * 10)
    assert float(L.smooth_loss(disp, edgy_img)) < float(
        L.smooth_loss(disp, flat_img)
    )


def test_depth_errors_perfect():
    gt = jnp.asarray(np.linspace(1, 50, 100).astype(np.float32))
    errs = L.compute_depth_errors(gt, gt)
    abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3 = [float(e) for e in errs]
    assert abs_rel == 0 and sq_rel == 0 and rmse == 0 and rmse_log == 0
    assert a1 == a2 == a3 == 1.0


def test_automask():
    r = jnp.asarray([[0.1, 0.5]])
    i = jnp.asarray([[0.2, 0.2]])
    np.testing.assert_array_equal(np.asarray(L.automask(r, i)), [[1.0, 0.0]])


def test_matching_mask_agreement():
    mono = jnp.full((1, 4, 4, 1), 5.0)
    lc = jnp.full((1, 4, 4), 1 / 5.0)  # matching depth = 5 -> trust
    assert np.all(np.asarray(L.matching_mask(mono, lc)) == 1.0)
    lc_bad = jnp.full((1, 4, 4), 1 / 50.0)  # matching depth = 50 -> distrust
    assert np.all(np.asarray(L.matching_mask(mono, lc_bad)) == 0.0)
