"""End-to-end stage-2 Trainer smoke (the reference's --train_cs --dc
fine-tune flow, trainer.py:90-103 presets + repdepth.py:175-262
dc_ft_init + the --ktf load at trainer.py:151):

synthetic CityScapes-preprocessed triplets on disk -> a stage-1
checkpoint loaded with --ktf (skips Adam state) -> dc freezing (only
adapter/deconv_adpt leaves trainable) -> real orchestration steps ->
checkpoint round-trip."""

import os

import jax
import numpy as np
import pytest
from flax import traverse_util
from PIL import Image

from ppeadepth_tpu.options import Config
from ppeadepth_tpu.train.trainer import Trainer

H, W, B = 64, 96, 8  # bs divisible by the 8 virtual CPU devices


@pytest.fixture
def cs_tmp(tmp_path, rng):
    """Synthetic ManyDepth-preprocessed CityScapes: one wide JPG holds the
    (-1, 0, +1) triplet; per-sequence intrinsics in {frame}_cam.txt
    (cityscapes_preprocessed_dataset.py:13-96)."""
    root = tmp_path / "cs"
    city = "aachen"
    os.makedirs(root / city, exist_ok=True)
    lines = []
    # 3:1 frame aspect like the real 1024x384 / 3
    fh, fw = 96, 160
    cam = np.array([200.0, 0.0, fw / 2, 0.0, 210.0, fh / 2, 0.0, 0.0, 1.0])
    for i in range(B):
        frame = f"aachen_000000_{i:06d}"
        wide = (rng.rand(fh, fw * 3, 3) * 255).astype(np.uint8)
        Image.fromarray(wide).save(str(root / city / f"{frame}.jpg"))
        np.savetxt(str(root / city / f"{frame}_cam.txt"), cam[None],
                   delimiter=",")
        lines.append(f"{city} {frame}")
    splits = tmp_path / "splits" / "cityscapes_preprocessed"
    os.makedirs(splits, exist_ok=True)
    (splits / "train_files.txt").write_text("\n".join(lines))
    # eval filenames are only parsed lazily (validate_every=0 here)
    (splits / "test_files.txt").write_text("\n".join(lines[:2]))
    return str(root), str(tmp_path / "splits")


def _flat(tree):
    """Flatten either a nested param tree or an already-flat partition
    (train/freeze.partition returns {tuple-path: leaf})."""
    out = {}
    for k, v in traverse_util.flatten_dict(tree).items():
        parts = []
        for p in k:
            parts.extend(p) if isinstance(p, tuple) else parts.append(p)
        out["/".join(parts)] = np.asarray(v)
    return out


def test_stage2_trainer_end_to_end(cs_tmp, tmp_path):
    root, splits_dir = cs_tmp

    # ---- stage-1 checkpoint to fine-tune from (mechanics only: the
    # reference loads a KITTI-trained model here)
    opt1 = Config(
        weights_init="scratch", adapter=True, rep_size="t", use_checkpoint=False,
        height=H, width=W, batch_size=B, num_depth_bins=8, bin_chunk=4,
        log_dir=str(tmp_path / "ckpt"), name="s1", validate_every=0,
    )
    t1 = Trainer(opt1, splits_dir=splits_dir)
    stage1 = t1.save_model("final")

    # ---- stage 2: --train_cs --dc --ktf
    opt2 = Config(
        weights_init="scratch", adapter=True, rep_size="t", use_checkpoint=False,
        train_cs=True, dc=True, ktf=True, dec_id=1,
        height=H, width=W, batch_size=B, num_depth_bins=8, bin_chunk=4,
        data_path=root, num_epochs=1, num_workers=2, validate_every=0,
        learning_rate=1e-5, load_weights_folder=stage1,
        log_dir=str(tmp_path / "ckpt"), name="cs",
        cs_eval_path=str(tmp_path / "cs_eval_unused"),
    )
    trainer = Trainer(opt2, splits_dir=splits_dir)
    # the train_cs preset applied (dataset/split), explicit size kept
    assert trainer.opt.dataset == "cityscapes_preprocessed"
    assert (trainer.opt.height, trainer.opt.width) == (H, W)

    # dc freezing (dc_ft_init, repdepth.py:256-262): decoders trainable
    # iff adapter-ish; backbone conv kernels frozen; pose stays trainable
    train_names = set(_flat(trainer.state.trainable))
    froz_names = set(_flat(trainer.state.frozen))
    for n in train_names:
        if n.startswith(("depth/", "mono_depth/")):
            assert "adpt" in n or "adapter" in n, n
    # deconv adapters exist (dc decoder) and are trainable; the decoder
    # trunk convs are frozen
    assert any("deconv_adpt" in n for n in train_names)
    assert any(n.startswith("depth/") for n in froz_names)
    assert any(n.startswith("pose/") for n in train_names)

    before_tr = _flat(trainer.state.trainable)
    before_fr = _flat(trainer.state.frozen)
    trainer.train()
    assert int(jax.device_get(trainer.state.step)) == 1  # 8 items / bs 8

    after_tr = _flat(trainer.state.trainable)
    after_fr = _flat(trainer.state.frozen)
    # frozen partition is bit-identical; something trainable moved,
    # including a stage-2 deconv adapter
    for n, v in before_fr.items():
        np.testing.assert_array_equal(v, after_fr[n], err_msg=n)
    moved = [n for n, v in before_tr.items()
             if np.abs(after_tr[n] - v).max() > 0]
    assert moved
    assert any("adapter" in n or "adpt" in n for n in moved)

    # checkpoint round-trip into a fresh stage-2 trainer
    final = os.path.join(trainer.log_path, "cs_final")
    assert os.path.exists(os.path.join(final, "model.msgpack"))
    opt3 = opt2.replace(load_weights_folder=final, ktf=False)
    trainer3 = Trainer(opt3, splits_dir=splits_dir)
    assert float(trainer3.state.min_depth_bin) == pytest.approx(
        float(trainer.state.min_depth_bin))
    rt = _flat(trainer3.state.trainable)
    for n in list(after_tr)[:20]:
        np.testing.assert_array_equal(rt[n], after_tr[n], err_msg=n)
