"""DDAD evaluation: `python -m ppeadepth_tpu.evaluate_ddad
--load_weights_folder <ckpt> --data_path <ddad_npz_root>`
(evaluate_ddad.py equivalent: inputs forced to 320x480 at eval like the
reference :251-255 — pass --eval_native_res to keep the model's training
resolution instead — depth clamp 200 m, per-sample GT npys)."""

from __future__ import annotations

import os
import sys

import jax
import numpy as np


def eval_config(opt):
    """DDAD presets + the reference's hard-forced 320x480 eval resolution
    (evaluate_ddad.py:251-255); --eval_native_res keeps the training
    resolution (a documented deviation for measuring at deploy shape)."""
    opt = opt.replace(ddad=True).with_mode_presets()
    if not opt.eval_native_res:
        opt = opt.replace(height=320, width=480)
    return opt


def evaluate(opt):
    from . import data as D
    from .ckpt import io as ckpt_io
    from .data.ddad import DDADNpzDataset
    from .eval import evaluator, metrics as M
    from .models import RepDepth
    from .train.trainer import readlines, synthetic_batch

    opt = eval_config(opt)
    model = RepDepth(opt)
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "droppath": jax.random.PRNGKey(1),
             "aug": jax.random.PRNGKey(2)},
            synthetic_batch(opt, 1), 0.1, 10.0, False,
        )
    )()
    min_bin, max_bin = 0.1, 10.0
    if opt.load_weights_folder:
        params, stats, track = ckpt_io.load_model(
            opt.load_weights_folder, variables["params"],
            variables["batch_stats"],
        )
        variables = {"params": params, "batch_stats": stats}
        min_bin = track.get("min_depth_bin", min_bin)
        max_bin = track.get("max_depth_bin", max_bin)

    index_file = os.path.join(opt.data_path, "val_index.txt")
    files = readlines(index_file)
    ds = DDADNpzDataset(
        opt.data_path, files, opt.height, opt.width, [0, -1], 4,
        is_train=False,
    )
    loader = D.DataLoader(
        ds, opt.batch_size, shuffle=False, num_workers=opt.num_workers,
        drop_last=False,
    )
    gt_depths = [ds.get_depth(f.strip(), 0, None, False) for f in files]
    errors, mono_errors = evaluator.run_eval(
        model, variables, opt, iter(loader),
        min_bin=min_bin, max_bin=max_bin, with_teacher=opt.eval_teacher,
        gt_depths=gt_depths, max_val=200.0,
    )
    print(M.format_metrics(errors))
    if mono_errors is not None:
        print("teacher:")
        print(M.format_metrics(mono_errors))
    return errors


def main(argv=None):
    from .options import parse_args

    evaluate(parse_args(argv))


if __name__ == "__main__":
    main(sys.argv[1:])
