"""End-to-end Trainer smoke: synthetic on-disk KITTI, tiny model, one
epoch over the real orchestration path (loader -> dp mesh -> jitted step
-> checkpoint save/load)."""

import os

import numpy as np
import pytest
from PIL import Image

from ppeadepth_tpu.options import Config
from ppeadepth_tpu.train.trainer import Trainer


@pytest.fixture
def kitti_tmp(tmp_path, rng):
    root = tmp_path / "kitti"
    folder = "2011_09_26/2011_09_26_drive_0001_sync"
    for frame in range(2, 12):
        arr = (rng.rand(188, 620, 3) * 255).astype(np.uint8)
        path = root / folder / "image_02" / "data" / f"{frame:010d}.jpg"
        os.makedirs(path.parent, exist_ok=True)
        Image.fromarray(arr).save(str(path))
    splits = tmp_path / "splits" / "tiny"
    os.makedirs(splits, exist_ok=True)
    lines = [f"{folder} {i} l" for i in range(3, 11)]
    (splits / "train_files.txt").write_text("\n".join(lines))
    (splits / "test_files.txt").write_text("\n".join(lines[:2]))
    return str(root), str(tmp_path / "splits")


def test_trainer_end_to_end(kitti_tmp, tmp_path):
    root, splits_dir = kitti_tmp
    opt = Config(
        weights_init="scratch",
        adapter=True, rep_size="t", use_checkpoint=False,
        height=64, width=96, batch_size=8, num_depth_bins=8, bin_chunk=4,
        data_path=root, split="tiny", num_epochs=1, num_workers=2,
        validate_every=0, log_dir=str(tmp_path / "ckpt"), name="smoke",
    )
    trainer = Trainer(opt, splits_dir=splits_dir)
    assert trainer.steps_per_epoch == 1  # 8 items / batch 8
    trainer.train()
    # metrics were logged and a final checkpoint exists
    metrics_file = os.path.join(trainer.log_path, "metrics.jsonl")
    assert os.path.exists(metrics_file)
    final = os.path.join(trainer.log_path, "smoke_final")
    assert os.path.exists(os.path.join(final, "model.msgpack"))
    assert os.path.exists(os.path.join(final, "opt.json"))
    assert int(trainer.state.step) == 1

    # resume path: a fresh trainer loads the checkpoint
    opt2 = opt.replace(load_weights_folder=final)
    trainer2 = Trainer(opt2, splits_dir=splits_dir)
    assert float(trainer2.state.min_depth_bin) == float(
        trainer.state.min_depth_bin
    )


def test_trainer_fast_pipeline(kitti_tmp, tmp_path):
    from ppeadepth_tpu.data import native_loader as NL

    if not NL.available():
        pytest.skip("native loader unavailable")
    root, splits_dir = kitti_tmp
    opt = Config(
        weights_init="scratch",
        adapter=True, rep_size="t", use_checkpoint=False,
        height=64, width=96, batch_size=8, num_depth_bins=8, bin_chunk=4,
        data_path=root, split="tiny", num_epochs=1, num_workers=2,
        validate_every=0, log_dir=str(tmp_path / "ckpt2"), name="fast",
        fast_pipeline=True,
    )
    trainer = Trainer(opt, splits_dir=splits_dir)
    trainer.train()
    assert int(trainer.state.step) == 1


def test_trainer_frozen_bf16_ckpt_f32(kitti_tmp, tmp_path):
    """With bf16 compute the Trainer stores the frozen encoder partition
    in bf16 on device (--frozen_bf16 auto) but checkpoints must carry
    the pristine f32 values through the REAL save path, and a resume
    must re-apply the storage cast."""
    import jax.numpy as jnp
    import flax.traverse_util as TU
    from flax import serialization

    root, splits_dir = kitti_tmp
    opt = Config(
        weights_init="scratch",
        adapter=True, rep_size="t", use_checkpoint=False,
        height=64, width=96, batch_size=8, num_depth_bins=8, bin_chunk=4,
        data_path=root, split="tiny", num_epochs=1, num_workers=2,
        validate_every=0, log_dir=str(tmp_path / "ckpt3"), name="fb16",
        compute_dtype="bfloat16",
    )
    trainer = Trainer(opt, splits_dir=splits_dir)
    # live state: frozen encoder leaves are bf16-stored
    assert trainer._frozen_f32 is not None
    enc_dtypes = {v.dtype for k, v in trainer.state.frozen.items()
                  if k[0] in ("encoder", "mono_encoder")}
    assert enc_dtypes == {jnp.dtype(jnp.bfloat16)}
    trainer.train()
    final = os.path.join(trainer.log_path, "fb16_final")
    with open(os.path.join(final, "model.msgpack"), "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    flat = TU.flatten_dict(blob["params"])
    # every frozen leaf in the file is f32 and equals the pristine copy
    for k, v in trainer._frozen_f32.items():
        assert flat[k].dtype == np.float32, k
        np.testing.assert_array_equal(flat[k], v)
    # resume: cast re-applied, pristine copy restored
    trainer2 = Trainer(opt.replace(load_weights_folder=final),
                       splits_dir=splits_dir)
    enc2 = {v.dtype for k, v in trainer2.state.frozen.items()
            if k[0] in ("encoder", "mono_encoder")}
    assert enc2 == {jnp.dtype(jnp.bfloat16)}
    for k, v in trainer._frozen_f32.items():
        np.testing.assert_array_equal(trainer2._frozen_f32[k], v)


def test_trainer_grad_accum(kitti_tmp, tmp_path):
    """Trainer wiring for --grad_accum: the boundary stack jit is
    applied (the step raises if not) and an epoch completes."""
    root, splits_dir = kitti_tmp
    opt = Config(
        weights_init="scratch",
        adapter=True, rep_size="t", use_checkpoint=False,
        height=64, width=96, batch_size=8, num_depth_bins=8, bin_chunk=4,
        data_path=root, split="tiny", num_epochs=1, num_workers=2,
        validate_every=0, log_dir=str(tmp_path / "ckpt4"), name="accum",
        grad_accum=2,
    )
    trainer = Trainer(opt, splits_dir=splits_dir)
    trainer.train()
    assert int(trainer.state.step) == 1
    assert np.isfinite(float(trainer.state.min_depth_bin))
