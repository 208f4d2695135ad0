"""Export DDAD (TRI dgp) to the dgp-free npz layout data/ddad.py reads.

The reference consumes DDAD through the `dgp` SDK at train/eval time
(ppeadepth/datasets/ddad_dataset.py:21-167: SynchronizedSceneDataset over
lidar + CAMERA_01 with ±1 frame context, depth generated from lidar).
`dgp` is a heavy, GPU-era dependency we don't take at runtime; instead
this offline tool walks the same SynchronizedSceneDataset once and writes:

  <out>/rgb/{idx}_{frame}.jpg    frames -1, 0, +1 at native resolution
  <out>/depth/{idx}.npy          lidar depth for frame 0 (val split)
  <out>/calib/{idx}.npy          3x3 intrinsics at native 1936x1216
  <out>/{split}_index.txt        one sample id per line

Run it on a machine with `dgp` installed:

  python tools/export_ddad.py --ddad_json .../ddad.json --split val \
      --out /data/ddad_npz

The writer itself (`write_sample`) is dgp-free and unit-tested on
synthetic arrays (tests/test_ddad_export.py); only `main` touches dgp.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image


def write_sample(
    out_root: str,
    sample_id: str,
    frames: dict,
    intrinsics: np.ndarray,
    depth: np.ndarray | None = None,
    quality: int = 95,
) -> None:
    """Write one sample. frames: {frame_offset: HxWx3 uint8 (or PIL)};
    intrinsics: 3x3 at the frames' native resolution; depth: HxW float
    lidar depth for frame 0 (None for train samples)."""
    os.makedirs(os.path.join(out_root, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(out_root, "calib"), exist_ok=True)
    for off, img in frames.items():
        if not isinstance(img, Image.Image):
            img = Image.fromarray(np.asarray(img))
        img.save(
            os.path.join(out_root, "rgb", f"{sample_id}_{off}.jpg"),
            quality=quality,
        )
    K = np.asarray(intrinsics, np.float32)
    assert K.shape == (3, 3), K.shape
    np.save(os.path.join(out_root, "calib", f"{sample_id}.npy"), K)
    if depth is not None:
        os.makedirs(os.path.join(out_root, "depth"), exist_ok=True)
        np.save(
            os.path.join(out_root, "depth", f"{sample_id}.npy"),
            np.asarray(depth, np.float32),
        )


def write_index(out_root: str, split: str, sample_ids: list) -> str:
    path = os.path.join(out_root, f"{split}_index.txt")
    with open(path, "w") as f:
        f.write("\n".join(str(s) for s in sample_ids) + "\n")
    return path


def main(argv=None):
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--ddad_json", required=True,
                   help="path to ddad_train_val/ddad.json")
    p.add_argument("--split", default="val", choices=["train", "val"])
    p.add_argument("--out", required=True)
    p.add_argument("--limit", type=int, default=0,
                   help="export at most N samples (0 = all)")
    args = p.parse_args(argv)

    try:
        from dgp.datasets import SynchronizedSceneDataset
    except ImportError as e:  # pragma: no cover - dgp not in this image
        raise SystemExit(
            "the `dgp` SDK is required to READ ddad.json; install it from "
            "github.com/TRI-ML/dgp on the export machine (the training/"
            "eval code itself never needs it): " + str(e)
        )

    # mirror ddad_dataset.py:27-34: front camera + lidar depth, +-1 context
    ds = SynchronizedSceneDataset(
        args.ddad_json,
        split=args.split,
        datum_names=("lidar", "CAMERA_01"),
        generate_depth_from_datum="lidar",
        forward_context=1,
        backward_context=1,
    )
    n = len(ds) if args.limit == 0 else min(args.limit, len(ds))
    ids = []
    for idx in range(n):
        samples = ds[idx]
        # samples[t][0] = CAMERA_01 datum at context t in (-1, 0, +1)
        # (ddad_dataset.py:116-127 uses indices 0, 1 for frames -1, 0)
        frames = {
            off: samples[t][0]["rgb"]
            for off, t in ((-1, 0), (0, 1), (1, 2))
            if t < len(samples)
        }
        depth = samples[1][0]["depth"] if args.split == "val" else None
        write_sample(
            args.out, str(idx), frames,
            samples[1][0]["intrinsics"], depth,
        )
        ids.append(idx)
        if idx % 100 == 0:
            print(f"{idx}/{n}")
    write_index(args.out, args.split, ids)
    print(f"wrote {len(ids)} samples to {args.out}")


if __name__ == "__main__":
    main()
