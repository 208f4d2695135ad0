"""From-pretrained bootstrap (ckpt/torch_import.bootstrap_pretrained):
the reference loads ImageNet RepLKNet weights into BOTH backbones at
construction (repdepth.py:84-111, replk_matching_adapter.py:46-67) and a
torchvision resnet18 into the 2-image pose encoder iff
--weights_init pretrained (repdepth.py:155, resnet_encoder.py:62-70)."""

import os

import jax
import numpy as np
import pytest
from flax import traverse_util

from ppeadepth_tpu.ckpt import torch_import as TI
from ppeadepth_tpu.models import RepDepth
from ppeadepth_tpu.options import Config

OPT = Config(adapter=True, rep_size="t", use_checkpoint=False,
             height=64, width=96, num_depth_bins=8, bin_chunk=4)


def _variables():
    from tests.test_train_step import make_batch

    model = RepDepth(OPT)
    batch = make_batch(OPT, 1)
    return model.init(
        {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1),
         "aug": jax.random.PRNGKey(2)},
        batch, 0.1, 10.0, False,
    )


def _fake_imagenet_sd(variables, rng):
    """A RAW RepLKNet ImageNet state_dict (plain backbone, no adapters),
    fabricated through the exact inverse name/layout mapping."""
    sd = TI.export_state_dict(
        variables["params"]["mono_encoder"],
        variables["batch_stats"]["mono_encoder"],
    )
    return {
        k: rng.rand(*v.shape).astype(np.float32)
        for k, v in sd.items()
        if "adpt" not in k and "adapter" not in k
    }


def _save_pth(path, sd):
    import torch

    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)


@pytest.fixture(scope="module")
def pretrained_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pretrained")
    rng = np.random.RandomState(0)
    variables = _variables()
    _save_pth(str(d / "RepLKNet-t.pth"), _fake_imagenet_sd(variables, rng))
    # torchvision-layout resnet18: 1-image stem [64, 3, 7, 7]
    pose_sd = TI.export_state_dict(
        variables["params"]["pose_encoder"],
        variables["batch_stats"]["pose_encoder"],
    )
    out = {}
    for k, v in pose_sd.items():
        if k == "conv1.weight":
            v = rng.rand(v.shape[0], 3, *v.shape[2:])
        out[k] = rng.rand(*v.shape).astype(np.float32) if k != "conv1.weight" \
            else v.astype(np.float32)
    _save_pth(str(d / "resnet18-f37072fd.pth"), out)
    return str(d), variables, out["conv1.weight"]


def test_bootstrap_loads_both_backbones_and_inflates_pose(pretrained_dir):
    d, variables, conv1_t = pretrained_dir
    opt = OPT.replace(backbone_weights=d)
    out = TI.bootstrap_pretrained(variables, opt, verbose=False)

    fb = traverse_util.flatten_dict(variables["params"])
    fa = traverse_util.flatten_dict(out["params"])
    changed = {k for k in fb
               if not np.allclose(np.asarray(fb[k]), np.asarray(fa[k]))}
    # both backbones loaded, identically (same file feeds both in the
    # reference); adapters / decoders / pose decoder stay at init
    mono = traverse_util.flatten_dict(out["params"]["mono_encoder"])
    match = traverse_util.flatten_dict(out["params"]["encoder"]["replk"])
    n_same = 0
    for k, v in mono.items():
        path = "/".join(k)
        if "adpt" in path or "adapter" in path:
            continue
        np.testing.assert_allclose(np.asarray(v), np.asarray(match[k]),
                                   err_msg=path)
        n_same += 1
    assert n_same > 20
    assert any(k[0] == "mono_encoder" for k in changed)
    assert any(k[0] == "encoder" for k in changed)
    assert not any("adapter" in "/".join(k) or "adpt" in "/".join(k)
                   for k in changed)
    assert not any(k[0] in ("depth", "mono_depth", "pose") for k in changed)

    # 2-image stem inflation: concat along in-channels / n_images
    # (resnet_encoder.py:62-70)
    got = np.asarray(out["params"]["pose_encoder"]["conv1"]["kernel"])
    one = conv1_t.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    np.testing.assert_allclose(got, np.concatenate([one, one], 2) / 2.0,
                               rtol=1e-6)

    # batch_stats loaded too
    sb = traverse_util.flatten_dict(variables["batch_stats"])
    sa = traverse_util.flatten_dict(out["batch_stats"])
    assert any(not np.allclose(np.asarray(sb[k]), np.asarray(sa[k]))
               for k in sb)


def test_bootstrap_missing_file_is_an_error(tmp_path):
    variables = {"params": {}, "batch_stats": {}}
    opt = OPT.replace(backbone_weights=str(tmp_path))
    with pytest.raises(FileNotFoundError, match="weights_init scratch"):
        TI.bootstrap_pretrained(variables, opt, verbose=False)


def test_trainer_bootstrap_smoke(pretrained_dir, tmp_path):
    """Trainer with --weights_init pretrained picks the weights up; the
    loaded stem survives into the (possibly bf16-stored) train state."""
    from ppeadepth_tpu.train.trainer import Trainer

    d, variables, _ = pretrained_dir
    opt = OPT.replace(backbone_weights=d, validate_every=0, batch_size=8,
                      log_dir=str(tmp_path / "ckpt"), name="boot")
    trainer = Trainer(opt, donate_batch=False)
    want = np.asarray(
        TI.bootstrap_pretrained(variables, opt, verbose=False)
        ["params"]["mono_encoder"]["stem_0"]["conv"]["kernel"]
    )
    got = np.asarray(jax.device_get(
        trainer.state.params["mono_encoder"]["stem_0"]["conv"]["kernel"]
    ), dtype=np.float32)
    np.testing.assert_allclose(got, want, atol=1e-2)

    # scratch mode and checkpoint-resume skip the bootstrap silently
    Trainer(opt.replace(weights_init="scratch"), donate_batch=False)
