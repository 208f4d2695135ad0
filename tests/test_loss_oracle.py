"""Golden test: the jitted branch loss against a torch oracle that
re-states the reference's generate_images_pred + compute_losses pipeline
(trainer.py:871-926, 995-1160) from its documented semantics.

This is the highest-risk parity surface (warp + SSIM + min-reprojection +
automask + smoothness all interact); everything here runs at B=2 on
random data and must agree to float tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ppeadepth_tpu.core.geometry import transformation_from_parameters
from ppeadepth_tpu.options import Config
from ppeadepth_tpu.train.step import _branch_losses

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_ssim(x, y):
    pool = torch.nn.AvgPool2d(3, 1)
    refl = torch.nn.ReflectionPad2d(1)
    x, y = refl(x), refl(y)
    mu_x, mu_y = pool(x), pool(y)
    sx = pool(x ** 2) - mu_x ** 2
    sy = pool(y ** 2) - mu_y ** 2
    sxy = pool(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + 0.01 ** 2) * (2 * sxy + 0.03 ** 2)
    d = (mu_x ** 2 + mu_y ** 2 + 0.01 ** 2) * (sx + sy + 0.03 ** 2)
    return torch.clamp((1 - n / d) / 2, 0, 1)


def _torch_reproj(pred, target):
    l1 = (target - pred).abs().mean(1, True)
    return 0.85 * _torch_ssim(pred, target).mean(1, True) + 0.15 * l1


def _torch_branch_loss(inputs_t, disp, poses, opt, is_multi,
                       consistency_mask=None, aug_mask=None,
                       mono_depth=None):
    """Oracle re-statement of the reference loss for scale 0 / sclm 0."""
    B, _, H, W = disp.shape
    min_disp, max_disp = 1 / opt.max_depth, 1 / opt.min_depth
    scaled = min_disp + (max_disp - min_disp) * disp
    depth = 1 / scaled

    # backproject / project / warp
    ys, xs = np.meshgrid(range(H), range(W), indexing="ij")
    pix = torch.from_numpy(
        np.stack([xs.reshape(-1), ys.reshape(-1), np.ones(H * W)], 0)
    ).float()
    target = inputs_t[("color", 0)]
    reprojs, warped_all = [], {}
    for f, T in poses.items():
        if is_multi:
            T = T.detach()
        invK = inputs_t["inv_K"]
        K = inputs_t["K"]
        cam = invK[:, :3, :3] @ pix[None]
        cam = cam * depth.reshape(B, 1, -1)
        cam = torch.cat([cam, torch.ones(B, 1, H * W)], 1)
        P = (K @ T)[:, :3]
        proj = P @ cam
        xy = proj[:, :2] / (proj[:, 2:3] + 1e-7)
        xy = xy.reshape(B, 2, H, W).permute(0, 2, 3, 1)
        gx = (xy[..., 0] / (W - 1) - 0.5) * 2
        gy = (xy[..., 1] / (H - 1) - 0.5) * 2
        grid = torch.stack([gx, gy], -1)
        warped = F.grid_sample(inputs_t[("color", f)], grid,
                               padding_mode="border", align_corners=True)
        warped_all[f] = warped
        reprojs.append(_torch_reproj(warped, target))
    reproj = torch.cat(reprojs, 1)
    reproj_min, _ = reproj.min(1, keepdim=True)

    if is_multi:
        mask = torch.ones_like(reproj_min)
        mask = mask * consistency_mask.unsqueeze(1)
        mask = mask * (1 - aug_mask)
        consistency_sel = 1 - mask
        closs = ((depth - mono_depth).abs() * consistency_sel).mean()
    else:
        idents = [
            _torch_reproj(inputs_t[("color", f)], target) for f in poses
        ]
        ident_min, _ = torch.cat(idents, 1).min(1, keepdim=True)
        # noise omitted (binary mask; flips only on ~1e-5 ties)
        mask = (reproj_min < ident_min).float()
        closs = torch.zeros(())
    rloss = (reproj_min * mask).sum() / (mask.sum() + 1e-7)

    mean_disp = disp.mean(2, True).mean(3, True)
    norm_disp = disp / (mean_disp + 1e-7)
    gx = (norm_disp[:, :, :, :-1] - norm_disp[:, :, :, 1:]).abs()
    gy = (norm_disp[:, :, :-1, :] - norm_disp[:, :, 1:, :]).abs()
    igx = (target[:, :, :, :-1] - target[:, :, :, 1:]).abs().mean(1, True)
    igy = (target[:, :, :-1, :] - target[:, :, 1:, :]).abs().mean(1, True)
    smooth = (gx * torch.exp(-igx)).mean() + (gy * torch.exp(-igy)).mean()

    return rloss + closs + opt.disparity_smoothness * smooth, depth


def _setup(rng, is_multi):
    opt = Config(height=16, width=24, disable_automasking=False)
    B, H, W = 2, 16, 24
    inputs = {}
    for f in (0, -1, 1):
        inputs[("color", f, 0)] = jnp.asarray(
            rng.rand(B, H, W, 3).astype(np.float32)
        )
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 14.0, 30.0, W / 2, H / 2
    inputs[("K", 0)] = jnp.asarray(np.stack([K] * B))
    inputs[("inv_K", 0)] = jnp.asarray(np.stack([np.linalg.pinv(K)] * B))

    disp = jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32) * 0.6 + 0.2)
    outputs = {("disp", 0): disp}
    poses_t = {}
    for f in (-1, 1):
        aa = jnp.asarray(rng.randn(B, 3).astype(np.float32) * 0.02)
        tt = jnp.asarray(rng.randn(B, 3).astype(np.float32) * 0.05)
        T = transformation_from_parameters(aa, tt, invert=(f < 0))
        outputs[("cam_T_cam", 0, f)] = T
        poses_t[f] = torch.from_numpy(np.asarray(T))
    if is_multi:
        outputs["consistency_mask"] = jnp.asarray(
            (rng.rand(B, H, W) > 0.3).astype(np.float32)
        )
        outputs["augmentation_mask"] = jnp.asarray(
            np.array([0.0, 1.0], np.float32).reshape(B, 1, 1, 1)
        )
        outputs[("mono_depth", 0, 0)] = jnp.asarray(
            rng.rand(B, H, W, 1).astype(np.float32) * 10 + 1
        )

    inputs_t = {
        ("color", f): torch.from_numpy(
            np.asarray(inputs[("color", f, 0)]).transpose(0, 3, 1, 2)
        )
        for f in (0, -1, 1)
    }
    inputs_t["K"] = torch.from_numpy(np.asarray(inputs[("K", 0)]))
    inputs_t["inv_K"] = torch.from_numpy(np.asarray(inputs[("inv_K", 0)]))
    return opt, inputs, outputs, inputs_t, poses_t, disp


def test_mono_branch_matches_torch_oracle(rng):
    opt, inputs, outputs, inputs_t, poses_t, disp = _setup(rng, False)
    loss, aux, depth = _branch_losses(
        inputs, outputs, opt, jax.random.PRNGKey(0), is_multi=False
    )
    ref_loss, ref_depth = _torch_branch_loss(
        inputs_t, torch.from_numpy(
            np.asarray(disp).transpose(0, 3, 1, 2)
        ), poses_t, opt, False,
    )
    np.testing.assert_allclose(
        np.asarray(depth)[..., 0], ref_depth[:, 0].numpy(), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(loss), float(ref_loss), rtol=2e-4
    )


def test_multi_branch_matches_torch_oracle(rng):
    opt, inputs, outputs, inputs_t, poses_t, disp = _setup(rng, True)
    loss, aux, _ = _branch_losses(
        inputs, outputs, opt, jax.random.PRNGKey(0), is_multi=True
    )
    ref_loss, _ = _torch_branch_loss(
        inputs_t, torch.from_numpy(
            np.asarray(disp).transpose(0, 3, 1, 2)
        ), poses_t, opt, True,
        consistency_mask=torch.from_numpy(
            np.asarray(outputs["consistency_mask"])
        ),
        aug_mask=torch.from_numpy(
            np.asarray(outputs["augmentation_mask"]).transpose(0, 3, 1, 2)
        ),
        mono_depth=torch.from_numpy(
            np.asarray(outputs[("mono_depth", 0, 0)]).transpose(0, 3, 1, 2)
        ),
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-4)
