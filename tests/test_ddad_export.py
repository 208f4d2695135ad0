"""tools/export_ddad.py writer <-> data/ddad.py reader round-trip.

The dgp-reading half of the exporter can't run here (no dgp SDK), but the
layout writer is pure; this verifies the written tree is exactly what
DDADNpzDataset consumes (layout contract of ddad_dataset.py:21-167
re-expressed dgp-free)."""

import numpy as np

from ppeadepth_tpu.data.ddad import DDADNpzDataset, RAW_H, RAW_W

import importlib.util
import pathlib

_spec = importlib.util.spec_from_file_location(
    "export_ddad",
    pathlib.Path(__file__).resolve().parents[1] / "tools" / "export_ddad.py",
)
export_ddad = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and export_ddad)


def _synthetic_tree(root, n=3, with_depth=True):
    rng = np.random.RandomState(0)
    K = np.array(
        [[2000.0, 0, RAW_W / 2], [0, 2000.0, RAW_H / 2], [0, 0, 1]],
        np.float32,
    )
    ids = []
    for i in range(n):
        frames = {
            off: (rng.rand(64, 96, 3) * 255).astype(np.uint8)
            for off in (-1, 0, 1)
        }
        depth = rng.rand(64, 96).astype(np.float32) * 80 if with_depth else None
        export_ddad.write_sample(str(root), str(i), frames, K, depth)
        ids.append(i)
    export_ddad.write_index(str(root), "val", ids)
    return ids


def test_export_layout_roundtrip(tmp_path):
    ids = _synthetic_tree(tmp_path)
    files = [str(i) for i in ids]
    ds = DDADNpzDataset(
        str(tmp_path), files, 64, 96, [0, -1], 4, is_train=False
    )
    assert ds.check_depth()
    sample = ds[0]
    for f in (0, -1):
        img = sample[("color", f, 0)]
        assert img.shape == (64, 96, 3)
        assert img.dtype == np.float32
    K = sample[("K", 0)]
    # normalized intrinsics scaled back up by the target resolution
    np.testing.assert_allclose(K[0, 0], 2000.0 / RAW_W * 96, rtol=1e-5)
    np.testing.assert_allclose(K[1, 1], 2000.0 / RAW_H * 64, rtol=1e-5)
    gt = ds.get_depth("0", 0, None, False)
    assert gt.shape == (64, 96) and gt.dtype == np.float32


def test_export_train_split_has_no_depth(tmp_path):
    _synthetic_tree(tmp_path, with_depth=False)
    ds = DDADNpzDataset(
        str(tmp_path), ["0"], 64, 96, [0, -1, 1], 4, is_train=True
    )
    assert not ds.check_depth()
    sample = ds[0]
    assert ("color", 1, 0) in sample


def test_ddad_eval_forces_reference_resolution():
    """evaluate_ddad must eval at the reference's 320x480
    (evaluate_ddad.py:251-255) unless --eval_native_res."""
    from ppeadepth_tpu.evaluate_ddad import eval_config
    from ppeadepth_tpu.options import Config

    opt = eval_config(Config())
    assert (opt.height, opt.width) == (320, 480)
    native = eval_config(Config(eval_native_res=True))
    assert (native.height, native.width) == (384, 640)
