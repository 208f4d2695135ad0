"""Validation / evaluation harness — the Trainer.val equivalent
(trainer.py:653-857) and the standalone evaluate_depth path
(evaluate_depth.py:66-298).

Device pass (jitted, batched): pose chain from raw ('color') frames ->
student encoder+decoder with the cost volume -> scaled disparity via
disp_to_depth(1e-3, 80); optional parallel teacher disparities. The numpy
metric pass lives in eval/metrics.py.

Unlike the reference — which runs the whole eval set on rank 0 while the
other ranks wait at a barrier (trainer.py:384-407) — this harness accepts
a mesh and shards eval batches over it.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.geometry import disp_to_depth, transformation_from_parameters
from ..models.repdepth import RepDepth
from ..options import Config
from . import metrics


MIN_VAL = 1e-3
MAX_VAL = 80.0


def make_eval_step(model: RepDepth, opt: Config, with_teacher: bool):
    """Jitted function: batch -> (multi scaled-disp, mono scaled-disp)."""

    def eval_step(variables, batch, min_bin, max_bin):
        def pose_pair(a, b, invert):
            feats = model.apply(
                variables, jnp.concatenate([a, b], -1), False,
                method=lambda m, x, t: m.pose_encoder(x, t),
            )
            aa, tt = model.apply(
                variables, [feats], method=lambda m, f: m.pose(f)
            )
            return transformation_from_parameters(
                aa[:, 0, 0], tt[:, 0, 0], invert=invert
            )

        frames = {0: batch[("color", 0, 0)], -1: batch[("color", -1, 0)]}
        if opt.static_camera:
            frames[-1] = frames[0]
        T = pose_pair(frames[-1], frames[0], invert=True)
        rel_poses = T[:, None]
        if opt.zero_cost_volume:
            rel_poses = rel_poses * 0.0
        lookup = frames[-1][:, None]

        out, lowest_cost, conf = model.apply(
            variables, frames[0], lookup, rel_poses,
            batch[("K", 2)], batch[("inv_K", 2)],
            min_bin, max_bin, False,
            method=RepDepth.forward_multi,
        )
        pred_disp, _ = disp_to_depth(out[("disp", 0)], MIN_VAL, MAX_VAL)
        pred_disp = pred_disp[..., 0]

        if opt.post_process:
            # Monodepth-v1 flip post-processing: evaluate the horizontal
            # flip too; blended on the host (metrics.py)
            out_f, _, _ = model.apply(
                variables, frames[0][:, :, ::-1], lookup[:, :, :, ::-1],
                rel_poses, batch[("K", 2)], batch[("inv_K", 2)],
                min_bin, max_bin, False, method=RepDepth.forward_multi,
            )
            disp_f, _ = disp_to_depth(out_f[("disp", 0)], MIN_VAL, MAX_VAL)
            pred_disp = jnp.stack([pred_disp, disp_f[..., 0][:, :, ::-1]], 1)

        mono_disp = None
        if with_teacher:
            mono_out = model.apply(
                variables, frames[0], False, method=RepDepth.forward_mono
            )
            mono_disp, _ = disp_to_depth(
                mono_out[("disp", 0)], MIN_VAL, opt.max_depth
            )
            mono_disp = mono_disp[..., 0]
        return pred_disp, mono_disp

    return jax.jit(eval_step)


def load_gt_depths(opt: Config, num: Optional[int] = None, splits_dir="./splits"):
    """GT depths per split (trainer.py:760-767)."""
    if opt.eval_split == "cityscapes":
        d = os.path.join(splits_dir, opt.eval_split, "gt_depths")
        n = num if num is not None else len(os.listdir(d))
        return [
            np.load(os.path.join(d, str(i).zfill(3) + "_depth.npy"))
            for i in range(n)
        ]
    gt_path = os.path.join(splits_dir, opt.eval_split, "gt_depths.npz")
    if not os.path.exists(gt_path):
        raise FileNotFoundError(
            f"{gt_path} not found — export it first with "
            f"`python -m ppeadepth_tpu.export_gt_depth --data_path <kitti> "
            f"--split {opt.eval_split}`"
        )
    return np.load(
        gt_path, fix_imports=True, encoding="latin1", allow_pickle=True
    )["data"]


def run_eval(
    model: RepDepth,
    variables,
    opt: Config,
    val_loader,
    min_bin=0.1,
    max_bin=10.0,
    with_teacher: bool = False,
    gt_depths=None,
    splits_dir: str = "./splits",
    min_val: float = MIN_VAL,
    max_val: float = MAX_VAL,
    mesh=None,
):
    """Full evaluation: returns (mean_errors, mono_mean_errors|None).

    With a `mesh`, every eval batch is dp-sharded across the devices
    (the reference evaluates on rank 0 while other ranks idle at a
    barrier, trainer.py:384-407); partial final batches are padded to the
    device count and the padding rows dropped after the device pass.
    """
    step = make_eval_step(model, opt, with_teacher)
    if mesh is not None:
        from ..parallel.mesh import replicate, shard_batch

        variables = replicate(variables, mesh)
        n_dev = mesh.devices.size
    disps, mono_disps = [], []
    for batch in val_loader:
        batch = {k: jnp.asarray(v) for k, v in batch.items()
                 if isinstance(v, np.ndarray) or hasattr(v, "shape")}
        pad = 0
        if mesh is not None:
            bsz = batch[("color", 0, 0)].shape[0]
            pad = (-bsz) % n_dev
            if pad:
                batch = {
                    k: jnp.concatenate(
                        [v, jnp.repeat(v[-1:], pad, axis=0)], 0
                    )
                    for k, v in batch.items()
                }
            batch = shard_batch(batch, mesh)
        d, md = step(variables, batch,
                     jnp.asarray(min_bin, jnp.float32),
                     jnp.asarray(max_bin, jnp.float32))
        d = np.asarray(d)
        md = None if md is None else np.asarray(md)
        if pad:
            d = d[:-pad]
            md = None if md is None else md[:-pad]
        disps.append(d)
        if md is not None:
            mono_disps.append(md)
    pred_disps = np.concatenate(disps, 0)
    if opt.post_process:
        pred_disps = metrics.batch_post_process_disparity(
            pred_disps[:, 0], pred_disps[:, 1]
        )
    if gt_depths is None:
        gt_depths = load_gt_depths(opt, pred_disps.shape[0], splits_dir)

    mean_errors, _ = metrics.evaluate_disps(
        pred_disps, gt_depths, opt.eval_split, min_val, max_val,
        opt.disable_median_scaling, opt.pred_depth_scale_factor,
    )
    mono_errors = None
    if mono_disps:
        mono_errors, _ = metrics.evaluate_disps(
            np.concatenate(mono_disps, 0), gt_depths, opt.eval_split,
            min_val, max_val, opt.disable_median_scaling,
            opt.pred_depth_scale_factor,
        )
    return mean_errors, mono_errors
