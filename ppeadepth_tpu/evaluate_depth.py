"""Standalone checkpoint evaluation: `python -m ppeadepth_tpu.evaluate_depth
--eval --load_weights_folder <ckpt> ...` (evaluate_depth.py:301-399).

Loads model.msgpack + track.json depth bins, runs the eval harness over
the test split and prints the 7 metrics plus average inference time.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import numpy as np


def evaluate(opt):
    from . import data as D
    from .ckpt import io as ckpt_io
    from .eval import evaluator, metrics as M
    from .models import RepDepth
    from .train.trainer import readlines, synthetic_batch

    opt = opt.with_mode_presets()
    model = RepDepth(opt)
    init_batch = synthetic_batch(opt, 1)
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "droppath": jax.random.PRNGKey(1),
             "aug": jax.random.PRNGKey(2)},
            init_batch, 0.1, 10.0, False,
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

    # dataset
    ds_cls = (
        D.DATASETS["cityscapes_eval"]
        if opt.eval_split == "cityscapes"
        else D.DATASETS["kitti"]
    )
    data_path = (
        opt.cs_eval_path if opt.eval_split == "cityscapes" else opt.data_path
    )
    split_file = os.path.join("./splits", opt.split, "test_files.txt")
    files = readlines(split_file)
    ds = ds_cls(
        data_path, files, opt.height, opt.width, [0, -1], 4,
        is_train=False, img_ext=".png" if opt.png else ".jpg",
    )
    loader = D.DataLoader(
        ds, opt.batch_size, shuffle=False, num_workers=opt.num_workers,
        drop_last=False,
    )

    t0 = time.perf_counter()
    errors, mono_errors = evaluator.run_eval(
        model, variables, opt, iter(loader),
        min_bin=min_bin, max_bin=max_bin,
        with_teacher=opt.eval_teacher,
    )
    dt = time.perf_counter() - t0
    print(f"avg wall-clock per image: {dt / len(ds) * 1000:.2f} ms")
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
