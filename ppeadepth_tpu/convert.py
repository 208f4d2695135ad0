"""Convert a reference torch checkpoint to the native format.

usage:
  python -m ppeadepth_tpu.convert --torch <model.pth> --out <folder>
      [--rep_size b] [--height 192] [--width 640] [--adapter] [--dc]
      [--min_depth_bin X --max_depth_bin Y]   (else read from track.pth)

Produces <folder>/model.msgpack + track.json + opt.json, loadable by
--load_weights_folder / InferenceSession / evaluate_depth.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser("ppeadepth_tpu.convert")
    p.add_argument("--torch", required=True, dest="torch_path")
    p.add_argument("--out", required=True)
    p.add_argument("--rep_size", default="b")
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--adapter", action="store_true", default=True)
    p.add_argument("--adpt_test", type=int, default=4)
    p.add_argument("--dc", action="store_true")
    p.add_argument("--dec_id", type=int, default=1)
    p.add_argument("--min_depth_bin", type=float, default=None)
    p.add_argument("--max_depth_bin", type=float, default=None)
    a = p.parse_args(argv)

    from .ckpt.torch_import import load_torch_repdepth
    from .models import RepDepth
    from .options import Config
    from .train.trainer import synthetic_batch
    from flax import serialization

    opt = Config(
        adapter=a.adapter, rep_size=a.rep_size, height=a.height,
        width=a.width, adpt_test=a.adpt_test, dc=a.dc, dec_id=a.dec_id,
    ).with_mode_presets()
    model = RepDepth(opt)
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "droppath": jax.random.PRNGKey(1),
             "aug": jax.random.PRNGKey(2)},
            synthetic_batch(opt, 1), 0.1, 10.0, False,
        )
    )()
    params, stats, loaded, missing = load_torch_repdepth(
        a.torch_path, variables["params"], variables["batch_stats"]
    )
    print(f"converted {loaded} tensors; {len(missing)} missing/untouched")

    # depth bins: flag override > sibling track.pth > defaults
    min_bin, max_bin = 0.1, 10.0
    track_pth = os.path.join(os.path.dirname(a.torch_path), "track.pth")
    if os.path.exists(track_pth):
        import torch

        t = torch.load(track_pth, map_location="cpu", weights_only=False)
        min_bin = float(t.get("min_depth_bin", min_bin))
        max_bin = float(t.get("max_depth_bin", max_bin))
    if a.min_depth_bin is not None:
        min_bin = a.min_depth_bin
    if a.max_depth_bin is not None:
        max_bin = a.max_depth_bin

    os.makedirs(a.out, exist_ok=True)
    with open(os.path.join(a.out, "model.msgpack"), "wb") as f:
        f.write(serialization.msgpack_serialize(
            {"params": jax.tree_util.tree_map(np.asarray, params),
             "batch_stats": jax.tree_util.tree_map(np.asarray, stats)}
        ))
    with open(os.path.join(a.out, "track.json"), "w") as f:
        json.dump({"height": opt.height, "width": opt.width,
                   "min_depth_bin": min_bin, "max_depth_bin": max_bin,
                   "step": 0}, f)
    import dataclasses

    with open(os.path.join(a.out, "opt.json"), "w") as f:
        json.dump(dataclasses.asdict(opt), f, indent=2)
    print(f"wrote native checkpoint to {a.out}")


if __name__ == "__main__":
    main(sys.argv[1:])
