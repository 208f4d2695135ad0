"""Per-block adapter ablation CLI (evaluate_depth_layer.py:353-430):
disable each encoder block's adapters in turn and log AbsRel/a1 per
block to repl.txt — the progressive layer-importance study.

usage: python -m ppeadepth_tpu.evaluate_depth_layer
           --load_weights_folder <ckpt> --data_path <kitti> [--rep_size l]
"""

from __future__ import annotations

import sys

import jax


def main(argv=None):
    from . import data as D
    from .ckpt import io as ckpt_io
    from .eval import ablation, evaluator
    from .models import RepDepth
    from .options import parse_args
    from .train.trainer import readlines, synthetic_batch

    opt = parse_args(argv).with_mode_presets()
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

    import os

    files = readlines(
        os.path.join("./splits", opt.split, "test_files.txt")
    )
    ds = D.DATASETS[opt.dataset](
        opt.data_path, files, opt.height, opt.width, [0, -1], 4,
        is_train=False, img_ext=".png" if opt.png else ".jpg",
    )

    def eval_fn(params):
        loader = D.DataLoader(
            ds, opt.batch_size, shuffle=False,
            num_workers=opt.num_workers, drop_last=False,
        )
        errors, _ = evaluator.run_eval(
            model, {"params": params,
                    "batch_stats": variables["batch_stats"]},
            opt, iter(loader), min_bin=min_bin, max_bin=max_bin,
        )
        return errors

    results = ablation.run_block_ablation(
        eval_fn, variables["params"],
        submodules=("encoder", "mono_encoder"), out_path="repl.txt",
    )
    print(f"wrote {len(results)} block ablations to repl.txt")


if __name__ == "__main__":
    main(sys.argv[1:])
