"""convert.py -> evaluate round-trip: a reference-format model.pth runs
through `python -m ppeadepth_tpu.convert` and the resulting native
checkpoint evaluates identically to the source model.

This is the insurance VERDICT r3 #8 asked for: the day a released
reference checkpoint (or real KITTI data) is available, accuracy parity
is a one-command run — the conversion+eval mechanics are already pinned.
"""

import json
import os

import jax
import numpy as np
import pytest

from ppeadepth_tpu import convert
from ppeadepth_tpu.ckpt import io as ckpt_io, torch_import as TI
from ppeadepth_tpu.eval import evaluator
from ppeadepth_tpu.models import RepDepth
from ppeadepth_tpu.options import Config

H, W = 64, 96
# convert.py exposes the reference's live surface (rep_size/size/dc) and
# keeps Config defaults elsewhere, so num_depth_bins stays 96 here
OPT = Config(adapter=True, rep_size="t", height=H, width=W, adpt_test=4)


def _variables(seed):
    from tests.test_train_step import make_batch

    model = RepDepth(OPT)
    return model, model.init(
        {"params": jax.random.PRNGKey(seed),
         "droppath": jax.random.PRNGKey(seed + 1),
         "aug": jax.random.PRNGKey(seed + 2)},
        make_batch(OPT, 1), 0.1, 10.0, False,
    )


def test_convert_then_evaluate_roundtrip(tmp_path, rng):
    import torch

    model, v_src = _variables(0)

    # reference-format checkpoint directory: model.pth + track.pth
    sd = TI.export_state_dict(v_src["params"], v_src["batch_stats"])
    ref_dir = tmp_path / "ref_ckpt"
    os.makedirs(ref_dir)
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               str(ref_dir / "model.pth"))
    torch.save({"min_depth_bin": 0.37, "max_depth_bin": 12.5},
               str(ref_dir / "track.pth"))

    out = str(tmp_path / "native_ckpt")
    convert.main(["--torch", str(ref_dir / "model.pth"), "--out", out,
                  "--rep_size", "t", "--height", str(H), "--width", str(W)])
    assert os.path.exists(os.path.join(out, "model.msgpack"))
    track = json.load(open(os.path.join(out, "track.json")))
    assert track["min_depth_bin"] == pytest.approx(0.37)  # from track.pth
    assert track["max_depth_bin"] == pytest.approx(12.5)

    # load into a DIFFERENT random init; forward must equal the source
    _, v_other = _variables(7)
    params, stats, track2 = ckpt_io.load_model(
        out, v_other["params"], v_other["batch_stats"])
    v_loaded = {"params": params, "batch_stats": stats}
    img = rng.rand(1, H, W, 3).astype(np.float32)
    d_src = model.apply(v_src, img, False, method=RepDepth.forward_mono)
    d_loaded = model.apply(v_loaded, img, False,
                           method=RepDepth.forward_mono)
    np.testing.assert_allclose(
        np.asarray(d_loaded[("disp", 0)]), np.asarray(d_src[("disp", 0)]),
        atol=1e-6)

    # and the converted checkpoint drives the eval harness end to end
    def val_batches():
        b = {}
        b[("color", 0, 0)] = rng.rand(2, H, W, 3).astype(np.float32)
        b[("color", -1, 0)] = rng.rand(2, H, W, 3).astype(np.float32)
        K = np.eye(4, dtype=np.float32)
        K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 14.0, 30.0, 12.0, 8.0
        b[("K", 2)] = np.stack([K] * 2)
        b[("inv_K", 2)] = np.stack([np.linalg.pinv(K)] * 2)
        yield b

    gt = [rng.rand(128, 192).astype(np.float32) * 40 + 2 for _ in range(2)]
    errors, _ = evaluator.run_eval(
        model, v_loaded, OPT, val_batches(),
        min_bin=track2["min_depth_bin"], max_bin=track2["max_depth_bin"],
        gt_depths=gt,
    )
    assert errors.shape == (7,) and np.isfinite(errors).all()
