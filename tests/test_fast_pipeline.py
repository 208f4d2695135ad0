"""Fast native pipeline end-to-end: decode -> device augment -> batch
schema identical to the classic loader's."""

import os

import jax
import numpy as np
import pytest
from PIL import Image

from ppeadepth_tpu.data import native_loader as NL
from ppeadepth_tpu.data.fast_pipeline import FastDecodePipeline, prepare_batch
from ppeadepth_tpu.data.kitti import KITTIRAWDataset

pytestmark = pytest.mark.skipif(
    not NL.available(), reason="native loader unavailable"
)


@pytest.fixture
def kitti_root(tmp_path, rng):
    root = tmp_path / "kitti"
    folder = "2011_09_26/2011_09_26_drive_0001_sync"
    for frame in (3, 4, 5, 6):
        arr = (rng.rand(375, 1242, 3) * 255).astype(np.uint8)
        path = root / folder / "image_02" / "data" / f"{frame:010d}.jpg"
        os.makedirs(path.parent, exist_ok=True)
        Image.fromarray(arr).save(str(path), quality=95)
    return str(root), folder


def test_fast_pipeline_schema(kitti_root):
    root, folder = kitti_root
    files = [f"{folder} 4 l", f"{folder} 5 l"]
    ds = KITTIRAWDataset(root, files, 96, 320, [0, -1, 1], 4, is_train=True)
    pipe = FastDecodePipeline(ds, batch_size=2, shuffle=False)
    frames, K = next(iter(pipe))
    assert set(frames) == {0, -1, 1}
    assert frames[0].shape == (2, 96, 320, 3) and frames[0].dtype == np.uint8
    assert K.shape == (2, 4, 4)

    batch = jax.jit(
        lambda fr, k, r: prepare_batch(fr, k, r, 96, 320, 4)
    )(
        {f: np.asarray(v) for f, v in frames.items()},
        K.astype(np.float32),
        jax.random.PRNGKey(0),
    )
    # standard schema at all scales, matching the classic loader
    for f in (0, -1, 1):
        for s in range(4):
            assert batch[("color", f, s)].shape == (
                2, 96 // 2 ** s, 320 // 2 ** s, 3
            )
    assert batch[("K", 0)].shape == (2, 4, 4)


def test_fast_pipeline_missing_frame(kitti_root):
    root, folder = kitti_root
    # frame 3 has no frame 2 -> blank lookup
    ds = KITTIRAWDataset(
        root, [f"{folder} 3 l"], 96, 320, [0, -1, 1], 4, is_train=True
    )
    pipe = FastDecodePipeline(ds, batch_size=1, shuffle=False)
    frames, K = next(iter(pipe))
    assert frames[-1].sum() == 0
    assert frames[0].sum() > 0


def test_decode_cache_roundtrip(kitti_root, tmp_path):
    """--decode_cache: epoch-0 misses decode + write, epoch-1 reads are
    byte-identical memmap hits (incl. the zero rows of missing frames);
    a second pipeline over the same split reuses the cache on disk."""
    root, folder = kitti_root
    files = [f"{folder} 4 l", f"{folder} 5 l"]
    cache_dir = str(tmp_path / "cache")
    ds = KITTIRAWDataset(root, files, 96, 320, [0, -1, 1], 4, is_train=True)
    pipe = FastDecodePipeline(ds, batch_size=2, shuffle=False,
                              cache_dir=cache_dir)
    f0, K0 = next(iter(pipe))          # epoch 0: decodes + fills cache
    assert pipe.cache.present.all()
    pipe.set_epoch(1)
    f1, K1 = next(iter(pipe))          # epoch 1: pure cache reads
    for f in (0, -1, 1):
        np.testing.assert_array_equal(f0[f], f1[f])
    np.testing.assert_array_equal(K0, K1)

    # fresh pipeline, same split -> same bytes from the on-disk cache
    pipe2 = FastDecodePipeline(ds, batch_size=2, shuffle=False,
                               cache_dir=cache_dir)
    assert pipe2.cache.present.all()   # reused, not rebuilt
    f2, _ = next(iter(pipe2))
    np.testing.assert_array_equal(f0[0], f2[0])

    # uncached reference: identical pixels
    pipe3 = FastDecodePipeline(ds, batch_size=2, shuffle=False)
    f3, _ = next(iter(pipe3))
    np.testing.assert_array_equal(f0[0], f3[0])


def test_persistent_pool_epoch_preload(kitti_root):
    """The next epoch's first batches are submitted before the current
    epoch's iterator is exhausted (no restart stall), and the preloaded
    epoch yields exactly the batches a cold iteration would."""
    root, folder = kitti_root
    files = [f"{folder} 4 l", f"{folder} 5 l"]
    ds = KITTIRAWDataset(root, files, 96, 320, [0, -1, 1], 4, is_train=True)
    pipe = FastDecodePipeline(ds, batch_size=1, shuffle=True)
    _ = list(iter(pipe))               # exhaust epoch 0
    assert 1 in pipe._preload          # epoch 1 already in flight
    pipe.set_epoch(1)
    got = [f[0].sum() for f, _ in iter(pipe)]

    cold = FastDecodePipeline(ds, batch_size=1, shuffle=True)
    cold.set_epoch(1)
    want = [f[0].sum() for f, _ in iter(cold)]
    assert got == want
