"""Native C++ decode/resize core tests (vs PIL as oracle)."""

import numpy as np
import pytest
from PIL import Image

from ppeadepth_tpu.data import native_loader as NL

pytestmark = pytest.mark.skipif(
    not NL.available(), reason="native loader toolchain unavailable"
)


def test_decode_full_size_matches_pil(tmp_path, rng):
    arr = (rng.rand(64, 96, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "img.jpg")
    Image.fromarray(arr).save(p, quality=92)
    ours = NL.decode_resize(p, 96, 64)
    ref = np.asarray(Image.open(p).convert("RGB"))
    # same libjpeg underneath -> identical decode at native size
    np.testing.assert_array_equal(ours, ref)


def test_resize_close_to_pil(tmp_path, rng):
    arr = (rng.rand(128, 192, 3) * 255).astype(np.uint8)
    # smooth it so resampling-filter differences are small
    for _ in range(4):
        arr = (
            arr.astype(np.float32) / 2
            + np.roll(arr, 1, 0).astype(np.float32) / 4
            + np.roll(arr, 1, 1).astype(np.float32) / 4
        ).astype(np.uint8)
    p = str(tmp_path / "img.jpg")
    Image.fromarray(arr).save(p, quality=95)
    ours = NL.decode_resize(p, 96, 64).astype(np.float32)
    ref = np.asarray(
        Image.open(p).convert("RGB").resize((96, 64), Image.BILINEAR)
    ).astype(np.float32)
    # DCT-scaled decode vs PIL triangle filter: small filter difference
    assert np.mean(np.abs(ours - ref)) < 12.0


def test_batch_and_missing(tmp_path, rng):
    arr = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "a.jpg")
    Image.fromarray(arr).save(p)
    out = NL.decode_resize_batch(
        [p, str(tmp_path / "missing.jpg"), p], 32, 24, n_threads=3
    )
    assert out.shape == (3, 24, 32, 3)
    assert out[0].sum() > 0
    assert out[1].sum() == 0  # blank-frame protocol for failures
    np.testing.assert_array_equal(out[0], out[2])
