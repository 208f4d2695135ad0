"""Offline GT depth export (export_gt_depth.py:18-64 equivalent):
project velodyne scans for every line of a split's test file and store
them as splits/<split>/gt_depths.npz.

usage: python -m ppeadepth_tpu.export_gt_depth --data_path P --split eigen
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from .data.kitti_utils import generate_depth_map


def export_gt_depths(data_path: str, split: str, splits_dir: str = "./splits"):
    split_folder = os.path.join(splits_dir, split)
    with open(os.path.join(split_folder, "test_files.txt")) as f:
        lines = [line.rstrip() for line in f if line.rstrip()]

    print(f"Exporting ground truth depths for {split}: {len(lines)} items")
    gt_depths = []
    for line in lines:
        folder, frame_id, _ = line.split()
        frame_id = int(frame_id)
        if split in ("eigen", "eigen_zhou", "eigen_benchmark"):
            calib_dir = os.path.join(data_path, folder.split("/")[0])
            velo = os.path.join(
                data_path, folder,
                "velodyne_points/data/{:010d}.bin".format(frame_id),
            )
            gt_depth = generate_depth_map(calib_dir, velo, 2, True)
        else:
            raise NotImplementedError(split)
        gt_depths.append(gt_depth.astype(np.float32))

    out = os.path.join(split_folder, "gt_depths.npz")
    np.savez_compressed(out, data=np.array(gt_depths, dtype=object))
    print(f"saved to {out}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--split", default="eigen")
    p.add_argument("--splits_dir", default="./splits")
    a = p.parse_args()
    export_gt_depths(a.data_path, a.split, a.splits_dir)


if __name__ == "__main__":
    main()
