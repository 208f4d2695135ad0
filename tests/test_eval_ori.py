"""Legacy (ManyDepth-style) eval: torch-checkpoint parity + CLI e2e.

Covers eval_depth_ori.py:87-431 — separate-file checkpoints over
ResnetEncoderMatching + Monodepth2 DepthDecoder, disp save, and the
KITTI-benchmark 16-bit PNG export."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from PIL import Image

from ppeadepth_tpu.ckpt import torch_import as TI
from ppeadepth_tpu.models.resnet_matching import (
    DepthDecoder, ResnetEncoderMatching,
)
from tests.ref_shims import load_reference

H, W = 64, 96
BINS = 8


@pytest.fixture(scope="module")
def ref_nets():
    return load_reference()


@pytest.fixture(scope="module")
def legacy_pair(ref_nets):
    """Reference legacy encoder/decoder, randomly initialized."""
    torch.manual_seed(7)
    enc = ref_nets.ResnetEncoderMatching(
        18, False, input_height=H, input_width=W,
        adaptive_bins=True, min_depth_bin=0.1, max_depth_bin=20.0,
        num_depth_bins=BINS, depth_binning="linear",
    ).eval()
    dec = ref_nets.DepthDecoder(enc.num_ch_enc, scales=range(4)).eval()
    gen = torch.Generator().manual_seed(8)
    for m in (enc, dec):
        for name, t in m.state_dict().items():
            if not torch.is_floating_point(t):
                continue
            if "running_mean" in name:
                t.normal_(0.0, 0.05, generator=gen)
            elif "running_var" in name:
                t.uniform_(0.8, 1.25, generator=gen)
    return enc, dec


def _templates(init_fn):
    shapes = jax.eval_shape(init_fn)
    z = lambda tr: jax.tree_util.tree_map(  # noqa: E731
        lambda s: np.zeros(s.shape, s.dtype), tr
    )
    return z(shapes["params"]), z(shapes.get("batch_stats", {}))


def test_legacy_encoder_decoder_parity(legacy_pair):
    enc_t, dec_t = legacy_pair
    gen = torch.Generator().manual_seed(9)
    cur = torch.rand((1, 3, H, W), generator=gen)
    lk = torch.rand((1, 1, 3, H, W), generator=gen)
    import ppeadepth.layers as ref_layers

    aa = torch.tensor([[[0.02, -0.01, 0.003]]])
    tr = torch.tensor([[[0.03, 0.02, -0.06]]])
    pose = ref_layers.transformation_from_parameters(aa, tr, False)[:, None]
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1] = 0.58 * W / 4, 1.92 * H / 4
    K[0, 2], K[1, 2] = 0.5 * W / 4, 0.5 * H / 4

    with torch.no_grad():
        # NOTE: plain floats — the legacy 'linear' binning path is
        # numpy-based (resnet_encoder.py:139-154) and chokes on tensors
        feats_t, lowest_t, conf_t = enc_t(
            cur, lk, pose, torch.from_numpy(K)[None],
            torch.from_numpy(np.linalg.pinv(K))[None],
            0.1, 20.0,
        )
        disp_t = dec_t(feats_t)[("disp", 0)]

    enc = ResnetEncoderMatching(
        num_layers=18, num_depth_bins=BINS, depth_binning="linear",
        bin_chunk=4,
    )
    dec = DepthDecoder(tuple(enc.num_ch_enc))
    nhwc = lambda t: np.asarray(t.detach()).transpose(0, 2, 3, 1)  # noqa
    cur_j = jnp.asarray(nhwc(cur))
    lk_j = jnp.asarray(np.asarray(lk).transpose(0, 1, 3, 4, 2))
    args = (cur_j, lk_j, jnp.asarray(np.asarray(pose)),
            jnp.asarray(K)[None], jnp.asarray(np.linalg.pinv(K))[None],
            0.1, 20.0)
    rng = {"params": jax.random.PRNGKey(0)}
    tp, ts = _templates(lambda: enc.init(rng, *args))
    p, s, loaded, missing = TI.map_state_dict(
        TI.translate_legacy_state_dict(
            {k: v.numpy() for k, v in enc_t.state_dict().items()
             if torch.is_floating_point(v)},
            "encoder",
        ), tp, ts,
    )
    assert not missing, missing[:8]
    feats_j, lowest_j, conf_j = enc.apply(
        {"params": p, "batch_stats": s}, *args
    )
    for i, (ft, fj) in enumerate(zip(feats_t, feats_j)):
        np.testing.assert_allclose(
            np.asarray(fj), nhwc(ft), atol=2e-4, rtol=1e-3,
            err_msg=f"legacy feats[{i}]",
        )
    np.testing.assert_allclose(np.asarray(conf_j), conf_t, atol=1e-6)

    tp, ts = _templates(
        lambda: dec.init(rng, [jnp.asarray(np.zeros(f.shape)) for f in
                               [nhwc(t) for t in feats_t]])
    )
    p, s, loaded, missing = TI.map_state_dict(
        TI.translate_legacy_state_dict(
            {k: v.numpy() for k, v in dec_t.state_dict().items()},
            "decoder",
        ), tp, ts,
    )
    assert not missing, missing[:8]
    out_j = dec.apply(
        {"params": p}, [jnp.asarray(nhwc(t)) for t in feats_t]
    )
    for sc in range(4):
        np.testing.assert_allclose(
            np.asarray(out_j[("disp", sc)])[..., 0],
            np.asarray(disp_t if sc == 0 else dec_t(feats_t)[("disp", sc)]
                       .detach())[:, 0],
            atol=1e-5, rtol=1e-4, err_msg=f"legacy disp scale {sc}",
        )


@pytest.fixture
def kitti_tmp(tmp_path, rng):
    root = tmp_path / "kitti"
    folder = "2011_09_26/2011_09_26_drive_0001_sync"
    for frame in range(2, 8):
        arr = (rng.rand(188, 620, 3) * 255).astype(np.uint8)
        path = root / folder / "image_02" / "data" / f"{frame:010d}.jpg"
        os.makedirs(path.parent, exist_ok=True)
        Image.fromarray(arr).save(str(path))
    splits = tmp_path / "splits" / "eigen"
    os.makedirs(splits, exist_ok=True)
    lines = [f"{folder} {i} l" for i in range(3, 7)]
    (splits / "test_files.txt").write_text("\n".join(lines))
    benchmark = tmp_path / "splits" / "benchmark"
    os.makedirs(benchmark, exist_ok=True)
    (benchmark / "test_files.txt").write_text("\n".join(lines))
    return str(root), str(tmp_path / "splits")


def _save_legacy_ckpt(folder, ref_nets, legacy_pair):
    """Write the reference's separate-file checkpoint layout
    (eval_depth_ori.py:119-190)."""
    enc_t, dec_t = legacy_pair
    os.makedirs(folder, exist_ok=True)
    enc_sd = enc_t.state_dict()
    enc_sd["min_depth_bin"] = torch.tensor(0.15)
    enc_sd["max_depth_bin"] = torch.tensor(18.0)
    torch.save(enc_sd, os.path.join(folder, "encoder.pth"))
    torch.save(dec_t.state_dict(), os.path.join(folder, "depth.pth"))
    torch.manual_seed(11)
    pe = ref_nets.ResnetEncoder(18, False, num_input_images=2)
    pd = ref_nets.PoseDecoder(pe.num_ch_enc, 1, 2)
    torch.save(pe.state_dict(), os.path.join(folder, "pose_encoder.pth"))
    torch.save(pd.state_dict(), os.path.join(folder, "pose.pth"))


def test_eval_ori_cli_end_to_end(kitti_tmp, tmp_path, ref_nets, legacy_pair):
    """CLI over synthetic KITTI: predicts, saves disps, exports benchmark
    PNGs."""
    from ppeadepth_tpu.eval_depth_ori import evaluate
    from ppeadepth_tpu.options import Config

    root, splits_dir = kitti_tmp
    ckpt = str(tmp_path / "legacy_ckpt")
    _save_legacy_ckpt(ckpt, ref_nets, legacy_pair)

    opt = Config(
        data_path=root, load_weights_folder=ckpt, eval_split="eigen",
        height=H, width=W, batch_size=2, num_workers=0,
        num_depth_bins=BINS, depth_binning="linear",
        save_pred_disps=True, no_eval=True,
    )
    assert evaluate(opt, splits_dir=splits_dir) is None
    saved = os.path.join(ckpt, "multi_eigen_split.npy")
    assert os.path.exists(saved)
    disps = np.load(saved)
    assert disps.shape == (4, H, W) and np.isfinite(disps).all()

    # benchmark export from the saved disps
    opt_b = opt.replace(
        eval_split="benchmark", ext_disp_to_eval=saved,
        save_pred_disps=False, no_eval=False,
    )
    assert evaluate(opt_b, splits_dir=splits_dir) is None
    pngs = os.listdir(os.path.join(ckpt, "benchmark_predictions"))
    assert len(pngs) == 4
    img = np.asarray(Image.open(
        os.path.join(ckpt, "benchmark_predictions", sorted(pngs)[0])
    ))
    assert img.shape == (352, 1216) and img.dtype == np.uint16
    assert img.max() > 0

    # teacher path: mono_encoder/mono_depth files
    torch.manual_seed(12)
    mono_enc = ref_nets.ResnetEncoder(18, False)
    mono_dec = ref_nets.DepthDecoder(mono_enc.num_ch_enc, scales=range(4))
    torch.save(mono_enc.state_dict(), os.path.join(ckpt, "mono_encoder.pth"))
    torch.save(mono_dec.state_dict(), os.path.join(ckpt, "mono_depth.pth"))
    opt_t = opt.replace(eval_teacher=True)
    assert evaluate(opt_t, splits_dir=splits_dir) is None
    assert os.path.exists(os.path.join(ckpt, "teacher_eigen_split.npy"))
