"""Data layer tests on synthetic on-disk datasets."""

import os

import numpy as np
import pytest
from PIL import Image

from ppeadepth_tpu.data import (
    CityscapesPreprocessedDataset,
    DataLoader,
    KITTIRAWDataset,
)


def _write_jpg(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path, quality=95)


@pytest.fixture
def kitti_root(tmp_path, rng):
    root = tmp_path / "kitti"
    folder = "2011_09_26/2011_09_26_drive_0001_sync"
    for frame in (3, 4, 5):
        arr = (rng.rand(375, 1242, 3) * 255).astype(np.uint8)
        _write_jpg(
            str(root / folder / "image_02" / "data" / f"{frame:010d}.jpg"),
            arr,
        )
    return str(root), folder


def test_kitti_item_schema(kitti_root):
    root, folder = kitti_root
    ds = KITTIRAWDataset(
        root, [f"{folder} 4 l"], 192, 640, [0, -1, 1], 4, is_train=True,
    )
    item = ds.__getitem__(0, epoch=0)
    for f in (0, -1, 1):
        for s in range(4):
            assert item[("color", f, s)].shape == (
                192 // 2 ** s, 640 // 2 ** s, 3,
            )
            assert item[("color_aug", f, s)].dtype == np.float32
    for s in range(4):
        K = item[("K", s)]
        assert K.shape == (4, 4)
        np.testing.assert_allclose(K[0, 0], 0.58 * (640 // 2 ** s), rtol=1e-6)
        np.testing.assert_allclose(
            K @ item[("inv_K", s)], np.eye(4), atol=1e-4
        )


def test_kitti_missing_frame_dummy(kitti_root):
    """First frame of a sequence: frame -1 missing -> zeros, aug stays
    zeros (the blank-frame protocol)."""
    root, folder = kitti_root
    ds = KITTIRAWDataset(
        root, [f"{folder} 3 l"], 192, 640, [0, -1, 1], 4, is_train=True,
    )
    item = ds.__getitem__(0, epoch=0)
    assert item[("color", -1, 0)].sum() == 0
    assert item[("color_aug", -1, 0)].sum() == 0
    assert item[("color", 0, 0)].sum() > 0


def test_kitti_deterministic_augmentation(kitti_root):
    root, folder = kitti_root
    ds = KITTIRAWDataset(
        root, [f"{folder} 4 l"], 96, 320, [0], 1, is_train=True,
    )
    a = ds.__getitem__(0, epoch=0)
    b = ds.__getitem__(0, epoch=0)
    np.testing.assert_array_equal(
        a[("color_aug", 0, 0)], b[("color_aug", 0, 0)]
    )
    c = ds.__getitem__(0, epoch=1)  # different epoch -> different aug/flip
    assert not np.array_equal(a[("color_aug", 0, 0)], c[("color_aug", 0, 0)])


def test_cityscapes_triplet(tmp_path, rng):
    root = tmp_path / "cs"
    wide = (rng.rand(384, 1024 * 3 // 2 * 2, 3) * 255).astype(np.uint8)
    wide = wide[:, : 3 * 512]  # 3 frames of 512 wide
    _write_jpg(str(root / "ulm" / "ulm_000064_000012.jpg"), wide)
    with open(root / "ulm" / "ulm_000064_000012_cam.txt", "w") as f:
        f.write("587.5,0.0,512.0,0.0,587.5,192.0,0.0,0.0,1.0")
    ds = CityscapesPreprocessedDataset(
        str(root), ["ulm ulm_000064_000012"], 192, 512, [0, -1, 1], 4,
        is_train=True,
    )
    item = ds.__getitem__(0, epoch=0)
    assert item[("color", 0, 0)].shape == (192, 512, 3)
    assert item[("color", -1, 0)].shape == (192, 512, 3)
    K = item[("K", 0)]
    np.testing.assert_allclose(K[0, 0], 587.5 / 1024 * 512, rtol=1e-5)


def test_loader_batching(kitti_root):
    root, folder = kitti_root
    files = [f"{folder} 4 l"] * 5
    ds = KITTIRAWDataset(root, files, 96, 320, [0, -1, 1], 4, is_train=True)
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2  # drop_last
    assert batches[0][("color", 0, 0)].shape == (2, 96, 320, 3)
    assert batches[0][("K", 2)].shape == (2, 4, 4)
