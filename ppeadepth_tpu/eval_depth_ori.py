"""Legacy ManyDepth-style evaluation (eval_depth_ori.py:87-431 equivalent):

  python -m ppeadepth_tpu.eval_depth_ori --load_weights_folder <dir> ...

Consumes the ORIGINAL separate-file torch checkpoints (encoder.pth,
depth.pth, pose_encoder.pth, pose.pth — or mono_encoder.pth /
mono_depth.pth with --eval_teacher) over the legacy
ResnetEncoderMatching + Monodepth2 DepthDecoder pair
(models/resnet_matching.py). Extras mirrored from the reference:

  --save_pred_disps        save {tag}_{split}_split.npy next to the ckpt
                           (tag = zero_cv | teacher | multi,
                           eval_depth_ori.py:294-310)
  --no_eval                stop after predicting/saving
  --ext_disp_to_eval PATH  skip inference, evaluate a saved .npy
  --eval_split benchmark   export 16-bit KITTI-benchmark depth PNGs at
                           1216x352, depth = 5.4/disp clipped to [0, 80]
                           (eval_depth_ori.py:319-327) and exit
  --zero_cost_volume / --static_camera / --eval_teacher
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

STEREO_SCALE_FACTOR = 5.4  # eval_depth_ori.py:30-31
BENCHMARK_W, BENCHMARK_H = 1216, 352


def _templates(init_fn):
    shapes = jax.eval_shape(init_fn)
    zeros = lambda tree: jax.tree_util.tree_map(  # noqa: E731
        lambda s: np.zeros(s.shape, s.dtype), tree
    )
    return zeros(shapes["params"]), zeros(shapes.get("batch_stats", {}))


def _load_module(folder, fname, kind, init_fn, prefix=""):
    from .ckpt import torch_import as TI

    path = os.path.join(folder, fname)
    sd = TI.load_torch_checkpoint(path)
    sd = TI.translate_legacy_state_dict(sd, kind)
    tp, ts = _templates(init_fn)
    params, stats, loaded, missing = TI.map_state_dict(
        sd, tp, ts, prefix=prefix
    )
    if missing:
        print(f"[{fname}] {loaded} loaded, {len(missing)} missing "
              f"(first: {missing[:3]})")
    return {"params": params, "batch_stats": stats}


def save_benchmark_pngs(pred_disps: np.ndarray, save_dir: str) -> None:
    """KITTI benchmark submission artifacts (eval_depth_ori.py:319-327):
    resize disp to 1216x352, depth = 5.4/disp clipped [0,80], uint16 PNG
    at 256x depth."""
    from PIL import Image

    os.makedirs(save_dir, exist_ok=True)
    for idx in range(len(pred_disps)):
        disp = np.asarray(
            Image.fromarray(pred_disps[idx]).resize(
                (BENCHMARK_W, BENCHMARK_H), Image.BILINEAR
            )
        )
        depth = np.clip(STEREO_SCALE_FACTOR / disp, 0, 80)
        depth16 = (depth * 256).astype(np.uint16)
        Image.fromarray(depth16).save(
            os.path.join(save_dir, f"{idx:010d}.png")
        )


def predict_disps(opt, splits_dir="./splits"):
    """Inference pass -> [N, h, w] scaled disparities."""
    from . import data as D
    from .core.geometry import disp_to_depth, transformation_from_parameters
    from .models import PoseDecoder, ResnetEncoder
    from .models.resnet_matching import DepthDecoder, ResnetEncoderMatching
    from .train.trainer import readlines

    folder = os.path.expanduser(opt.load_weights_folder)
    assert os.path.isdir(folder), f"no checkpoint folder {folder}"

    frames_to_load = list(dict.fromkeys([0] + list(opt.matching_ids[1:])))

    rng = {"params": jax.random.PRNGKey(0)}
    min_bin, max_bin = 0.1, 20.0
    if opt.eval_teacher:
        # teacher path: plain ResnetEncoder + DepthDecoder
        # (eval_depth_ori.py:119-122, 211-214)
        enc = ResnetEncoder(num_layers=opt.num_layers)
        dec = DepthDecoder(tuple(enc.num_ch_enc))
        x = jnp.zeros((1, opt.height, opt.width, 3), jnp.float32)
        enc_v = _load_module(
            folder, "mono_encoder.pth", "pose_encoder",
            lambda: enc.init(rng, x), prefix="encoder.",
        )
        feats_s = jax.eval_shape(
            lambda: enc.apply(enc_v, x)
        )
        feats0 = [jnp.zeros(s.shape, s.dtype) for s in feats_s]
        dec_v = _load_module(
            folder, "mono_depth.pth", "decoder",
            lambda: dec.init(rng, feats0),
        )

        def step(batch):
            feats = enc.apply(enc_v, batch[("color", 0, 0)])
            out = dec.apply(dec_v, feats)
            disp, _ = disp_to_depth(
                out[("disp", 0)], opt.min_depth, opt.max_depth
            )
            return disp[..., 0]

    else:
        enc = ResnetEncoderMatching(
            num_layers=opt.num_layers,
            num_depth_bins=opt.num_depth_bins,
            depth_binning=opt.depth_binning,
        )
        dec = DepthDecoder(tuple(enc.num_ch_enc))
        pose_enc = ResnetEncoder(num_layers=18, num_input_images=2)
        pose_dec = PoseDecoder(
            pose_enc.num_ch_enc, num_input_features=1,
            num_frames_to_predict_for=2,
        )
        from .ckpt import torch_import as TI

        enc_sd = TI.load_torch_checkpoint(os.path.join(folder, "encoder.pth"))
        # adaptive depth-bin range rides inside encoder.pth
        # (eval_depth_ori.py:175-176)
        raw = __import__("torch").load(
            os.path.join(folder, "encoder.pth"), map_location="cpu",
            weights_only=False,
        )
        min_bin = float(raw.get("min_depth_bin", min_bin))
        max_bin = float(raw.get("max_depth_bin", max_bin))

        x = jnp.zeros((1, opt.height, opt.width, 3), jnp.float32)
        lk = jnp.zeros((1, 1, opt.height, opt.width, 3), jnp.float32)
        poses0 = jnp.tile(jnp.eye(4, dtype=jnp.float32), (1, 1, 1, 1))
        K0 = jnp.tile(jnp.eye(4, dtype=jnp.float32), (1, 1, 1))
        enc_init = lambda: enc.init(  # noqa: E731
            rng, x, lk, poses0, K0, K0, 0.1, 20.0
        )
        tp, ts = _templates(enc_init)
        params, stats, loaded, missing = TI.map_state_dict(
            TI.translate_legacy_state_dict(enc_sd, "encoder"), tp, ts
        )
        if missing:
            print(f"[encoder.pth] {loaded} loaded, {len(missing)} missing")
        enc_v = {"params": params, "batch_stats": stats}

        feats_s = jax.eval_shape(
            lambda: enc.apply(enc_v, x, lk, poses0, K0, K0, 0.1, 20.0)
        )[0]
        feats0 = [jnp.zeros(s.shape, s.dtype) for s in feats_s]
        dec_v = _load_module(folder, "depth.pth", "decoder",
                             lambda: dec.init(rng, feats0))
        pe_x = jnp.zeros((1, opt.height, opt.width, 6), jnp.float32)
        pe_v = _load_module(folder, "pose_encoder.pth", "pose_encoder",
                            lambda: pose_enc.init(rng, pe_x),
                            prefix="encoder.")
        pf_s = jax.eval_shape(lambda: pose_enc.apply(pe_v, pe_x))
        pf0 = [jnp.zeros(s.shape, s.dtype) for s in pf_s]
        pd_v = _load_module(folder, "pose.pth", "pose",
                            lambda: pose_dec.init(rng, [pf0]))

        def pose_pair(a, b, invert):
            feats = pose_enc.apply(pe_v, jnp.concatenate([a, b], -1))
            aa, tt = pose_dec.apply(pd_v, [feats])
            return transformation_from_parameters(
                aa[:, 0, 0], tt[:, 0, 0], invert=invert
            )

        def step(batch):
            frames = {
                fi: batch[("color", fi, 0)] for fi in frames_to_load
            }
            if opt.static_camera:
                frames = {fi: frames[0] for fi in frames_to_load}
            # chained matching poses (eval_depth_ori.py:222-247)
            rel = {}
            for fi in frames_to_load[1:]:
                if fi < 0:
                    T = pose_pair(frames[fi], frames[fi + 1], invert=True)
                    if fi != -1:
                        T = T @ rel[fi + 1]
                else:
                    T = pose_pair(frames[fi - 1], frames[fi], invert=False)
                    if fi != 1:
                        T = T @ rel[fi - 1]
                rel[fi] = T
            rel_poses = jnp.stack(
                [rel[fi] for fi in frames_to_load[1:]], 1
            )
            if opt.zero_cost_volume:
                rel_poses = rel_poses * 0.0
            lookup = jnp.stack(
                [frames[fi] for fi in frames_to_load[1:]], 1
            )
            feats, _, _ = enc.apply(
                enc_v, frames[0], lookup, rel_poses,
                batch[("K", 2)], batch[("inv_K", 2)], min_bin, max_bin,
            )
            out = dec.apply(dec_v, feats)
            disp, _ = disp_to_depth(
                out[("disp", 0)], opt.min_depth, opt.max_depth
            )
            return disp[..., 0]

    step = jax.jit(step)

    split_file = os.path.join(splits_dir, opt.eval_split, "test_files.txt")
    files = readlines(split_file)
    ds_cls = (
        D.DATASETS["cityscapes_eval"]
        if opt.eval_split == "cityscapes"
        else D.DATASETS["kitti"]
    )
    data_path = (
        opt.cs_eval_path if opt.eval_split == "cityscapes" else opt.data_path
    )
    ds = ds_cls(
        data_path, files, opt.height, opt.width, frames_to_load, 4,
        is_train=False, img_ext=".png" if opt.png else ".jpg",
    )
    loader = D.DataLoader(
        ds, opt.batch_size, shuffle=False, num_workers=opt.num_workers,
        drop_last=False,
    )
    disps = []
    for batch in loader:
        batch = {k: jnp.asarray(v) for k, v in batch.items()
                 if hasattr(v, "shape")}
        disps.append(np.asarray(step(batch)))
    return np.concatenate(disps, 0)


def evaluate(opt, splits_dir="./splits"):
    from .eval import evaluator, metrics as M

    if opt.ext_disp_to_eval is not None:
        print(f"-> loading predictions from {opt.ext_disp_to_eval}")
        pred_disps = np.load(opt.ext_disp_to_eval)
    else:
        pred_disps = predict_disps(opt, splits_dir)

    if opt.save_pred_disps:
        tag = ("zero_cv" if opt.zero_cost_volume
               else "teacher" if opt.eval_teacher else "multi")
        out = os.path.join(
            opt.load_weights_folder, f"{tag}_{opt.eval_split}_split.npy"
        )
        print(f"-> saving predicted disparities to {out}")
        np.save(out, pred_disps)

    if opt.no_eval:
        print("-> evaluation disabled; done")
        return None

    if opt.eval_split == "benchmark":
        save_dir = os.path.join(
            opt.load_weights_folder, "benchmark_predictions"
        )
        print(f"-> exporting benchmark predictions to {save_dir}")
        save_benchmark_pngs(pred_disps, save_dir)
        print("-> no ground truth for the KITTI benchmark; done")
        return None

    gt_depths = evaluator.load_gt_depths(
        opt, pred_disps.shape[0], splits_dir
    )
    errors, _ = M.evaluate_disps(
        pred_disps, gt_depths, opt.eval_split, 1e-3, 80.0,
        opt.disable_median_scaling, opt.pred_depth_scale_factor,
    )
    print(M.format_metrics(errors))
    return errors


def main(argv=None):
    from .options import parse_args

    evaluate(parse_args(argv))


if __name__ == "__main__":
    main(sys.argv[1:])
