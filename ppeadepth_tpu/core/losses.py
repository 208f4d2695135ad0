"""Self-supervised photometric loss primitives (NHWC, pure functions).

Reproduces the reference loss stack exactly (verified vs torch in
tests/test_losses.py):
  - SSIM: 3x3 average-pool windows over reflection-padded inputs,
    C1=0.01^2, C2=0.03^2, output (1-SSIM)/2 clamped to [0,1]
    (layers.py:226-257);
  - reprojection loss 0.85*SSIM + 0.15*L1, each meaned over channels
    (trainer.py:995-1007);
  - automask: keep a pixel iff its min reprojection loss beats the min
    identity-reprojection loss (trainer.py:1009-1027), with the reference's
    randn*1e-5 tie-break noise applied by the caller;
  - edge-aware first-order smoothness on mean-normalized disparity
    (layers.py:210-223);
  - the 7 standard depth metrics (layers.py:260-278).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _avg_pool3x3_reflect(x):
    """3x3/stride-1 average pool over reflection-padded NHWC input."""
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    out = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "VALID"
    )
    return out / 9.0


def ssim(x, y):
    """(1 - SSIM)/2 distance map, same shape as inputs (NHWC)."""
    C1 = 0.01 ** 2
    C2 = 0.03 ** 2
    mu_x = _avg_pool3x3_reflect(x)
    mu_y = _avg_pool3x3_reflect(y)
    sigma_x = _avg_pool3x3_reflect(x * x) - mu_x * mu_x
    sigma_y = _avg_pool3x3_reflect(y * y) - mu_y * mu_y
    sigma_xy = _avg_pool3x3_reflect(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
    d = (mu_x ** 2 + mu_y ** 2 + C1) * (sigma_x + sigma_y + C2)
    return jnp.clip((1 - n / d) / 2, 0.0, 1.0)


def reprojection_loss(pred, target, no_ssim=False):
    """Per-pixel photometric error [B, H, W, 1]. trainer.py:995-1007."""
    l1 = jnp.mean(jnp.abs(target - pred), axis=-1, keepdims=True)
    if no_ssim:
        return l1
    s = jnp.mean(ssim(pred, target), axis=-1, keepdims=True)
    return 0.85 * s + 0.15 * l1


def automask(reproj_loss, identity_loss):
    """1.0 where reprojection loss < identity loss (moving-pixel mask).

    Matches trainer.py:1009-1027: argmin over the concatenation, mask where
    the non-identity loss wins. Strict '<' because argmin returns the first
    index on ties.
    """
    return (reproj_loss < identity_loss).astype(reproj_loss.dtype)


def smooth_loss(disp, img):
    """Edge-aware first-order smoothness (scalar). layers.py:210-223.

    disp: [B, H, W, 1]; img: [B, H, W, C].
    """
    grad_disp_x = jnp.abs(disp[:, :, :-1, :] - disp[:, :, 1:, :])
    grad_disp_y = jnp.abs(disp[:, :-1, :, :] - disp[:, 1:, :, :])
    grad_img_x = jnp.mean(
        jnp.abs(img[:, :, :-1, :] - img[:, :, 1:, :]), -1, keepdims=True
    )
    grad_img_y = jnp.mean(
        jnp.abs(img[:, :-1, :, :] - img[:, 1:, :, :]), -1, keepdims=True
    )
    grad_disp_x = grad_disp_x * jnp.exp(-grad_img_x)
    grad_disp_y = grad_disp_y * jnp.exp(-grad_img_y)
    return jnp.mean(grad_disp_x) + jnp.mean(grad_disp_y)


def normalized_smooth_loss(disp, color, eps=1e-7):
    """Smoothness on mean-normalized disparity (trainer.py:1147-1151)."""
    mean_disp = jnp.mean(disp, axis=(1, 2), keepdims=True)
    norm_disp = disp / (mean_disp + eps)
    return smooth_loss(norm_disp, color)


def compute_depth_errors(gt, pred):
    """abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3 (layers.py:260-278)."""
    thresh = jnp.maximum(gt / pred, pred / gt)
    a1 = jnp.mean((thresh < 1.25).astype(jnp.float32))
    a2 = jnp.mean((thresh < 1.25 ** 2).astype(jnp.float32))
    a3 = jnp.mean((thresh < 1.25 ** 3).astype(jnp.float32))
    rmse = jnp.sqrt(jnp.mean((gt - pred) ** 2))
    rmse_log = jnp.sqrt(jnp.mean((jnp.log(gt) - jnp.log(pred)) ** 2))
    abs_rel = jnp.mean(jnp.abs(gt - pred) / gt)
    sq_rel = jnp.mean((gt - pred) ** 2 / gt)
    return abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3


def matching_mask(mono_depth, lowest_cost_disp):
    """Distrust mask where cost-volume argmin depth and teacher depth differ
    by >100% in either direction. trainer.py:859-869.

    mono_depth: [B, H, W, 1]; lowest_cost_disp: [B, H, W] (1/depth).
    Returns [B, H, W, 1] float mask.
    """
    matching_depth = (1.0 / lowest_cost_disp)[..., None]
    mask = ((matching_depth - mono_depth) / mono_depth) < 1.0
    mask &= ((mono_depth - matching_depth) / matching_depth) < 1.0
    return mask.astype(mono_depth.dtype)
