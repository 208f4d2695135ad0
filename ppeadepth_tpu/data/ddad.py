"""DDAD dataset (dgp-free).

The reference's DDADDataset (ppeadepth/datasets/ddad_dataset.py:21-167)
depends on the TRI `dgp` SDK (SynchronizedSceneDataset over CAMERA_01 +
lidar, resize to 640x384, intrinsics scaled from 1936x1216) and is in
fact commented out of datasets/__init__.py:5 in the reference snapshot.
Here the loader reads a dgp-free pre-exported layout (the same shape the
reference's eval consumes: per-sample npy GT, trainer.py:664-668,788-790):

  <root>/rgb/{idx}_{frame}.jpg   frames at native or any resolution
  <root>/depth/{idx}.npy         lidar depth map for frame 0 (val only)

Use tools/export_ddad.py (requires dgp, run offline) to produce it.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from .mono_dataset import MonoDataset

RAW_W, RAW_H = 1936, 1216


class DDADNpzDataset(MonoDataset):
    """frame_idxs (0, -1, 1); filenames are sample indices (one per line)."""

    def index_to_folder_and_frame_idx(self, index):
        return self.filenames[index].strip(), 0, None

    def check_depth(self):
        if not self.filenames:
            return False
        return os.path.isfile(
            os.path.join(
                self.data_path, "depth", f"{self.filenames[0].strip()}.npy"
            )
        )

    def load_intrinsics(self, sample_id, frame_index):
        path = os.path.join(self.data_path, "calib", f"{sample_id}.npy")
        K = np.eye(4, dtype=np.float32)
        K33 = np.load(path)
        K[:3, :3] = K33
        K[0, :] /= RAW_W
        K[1, :] /= RAW_H
        return K

    def get_color(self, sample_id, frame_index, side, do_flip):
        path = os.path.join(
            self.data_path, "rgb", f"{sample_id}_{frame_index}.jpg"
        )
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        img = self.loader(path)
        if do_flip:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        return img

    def get_depth(self, sample_id, frame_index, side, do_flip):
        depth = np.load(
            os.path.join(self.data_path, "depth", f"{sample_id}.npy")
        ).astype(np.float32)
        if do_flip:
            depth = depth[:, ::-1]
        return depth
