"""Velodyne -> depth-map projection golden test on synthetic calibration:
identity-ish geometry with known 3D points must land at hand-computable
pixels with the right depths; duplicate resolution keeps the nearest."""

import os

import numpy as np

from ppeadepth_tpu.data.kitti_utils import generate_depth_map
from ppeadepth_tpu.export_gt_depth import export_gt_depths


def _write_calib(d, W=640, H=192, fx=100.0, fy=100.0):
    os.makedirs(d, exist_ok=True)
    cx, cy = W / 2, H / 2
    P = np.array([[fx, 0, cx, 0], [0, fy, cy, 0], [0, 0, 1, 0]])
    with open(os.path.join(d, "calib_cam_to_cam.txt"), "w") as f:
        f.write(f"S_rect_02: {W} {H}\n")
        f.write("R_rect_00: 1 0 0 0 1 0 0 0 1\n")
        f.write("P_rect_02: " + " ".join(str(v) for v in P.reshape(-1)) + "\n")
    with open(os.path.join(d, "calib_velo_to_cam.txt"), "w") as f:
        # velodyne x-forward -> camera z-forward (standard axis swap)
        f.write("R: 0 -1 0 0 0 -1 1 0 0\n")
        f.write("T: 0 0 0\n")


def _write_velo(path, pts_velo):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = np.concatenate(
        [pts_velo, np.ones((len(pts_velo), 1))], 1
    ).astype(np.float32)
    arr.tofile(path)


def test_projection_golden(tmp_path):
    calib = str(tmp_path / "scene")
    _write_calib(calib)
    # velodyne (x fwd, y left, z up) -> cam (x right, y down, z fwd):
    # cam = (-y, -z, x). point (10, 0, 0) -> cam (0, 0, 10):
    # u = fx*0/10 + cx = 320, v = cy = 96, depth 10
    pts = np.array([
        [10.0, 0.0, 0.0],
        [20.0, -2.0, 1.0],   # cam (2, -1, 20): u = 100*2/20+320 = 330,
                             # v = 100*(-1)/20+96 = 91, depth 20
        [-5.0, 0.0, 0.0],    # behind the lidar: dropped (x < 0)
    ])
    velo = str(tmp_path / "scene/velodyne_points/data/0000000000.bin")
    _write_velo(velo, pts)

    depth = generate_depth_map(calib, velo, cam=2)
    assert depth.shape == (192, 640)
    # KITTI convention: round(u) - 1
    assert abs(depth[95, 319] - 10.0) < 1e-4
    assert abs(depth[90, 329] - 20.0) < 1e-4
    assert (depth > 0).sum() == 2


def test_duplicate_keeps_nearest(tmp_path):
    calib = str(tmp_path / "scene")
    _write_calib(calib)
    # two points projecting to the same pixel; nearest wins
    pts = np.array([[10.0, 0.0, 0.0], [30.0, 0.0, 0.0]])
    velo = str(tmp_path / "scene/velodyne_points/data/0000000000.bin")
    _write_velo(velo, pts)
    depth = generate_depth_map(calib, velo, cam=2)
    assert abs(depth[95, 319] - 10.0) < 1e-4


def test_export_gt_depths(tmp_path):
    root = tmp_path / "kitti"
    scene = "2011_09_26"
    folder = f"{scene}/2011_09_26_drive_0001_sync"
    _write_calib(str(root / scene))
    _write_velo(
        str(root / folder / "velodyne_points/data/0000000004.bin"),
        np.array([[10.0, 0.0, 0.0]]),
    )
    splits = tmp_path / "splits" / "eigen"
    os.makedirs(splits, exist_ok=True)
    (splits / "test_files.txt").write_text(f"{folder} 4 l")
    export_gt_depths(str(root), "eigen", str(tmp_path / "splits"))
    blob = np.load(str(splits / "gt_depths.npz"), allow_pickle=True)
    gt = blob["data"][0]
    assert gt.shape == (192, 640)
    assert abs(gt[95, 319] - 10.0) < 1e-4
