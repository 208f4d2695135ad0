"""Cross-implementation parity vs the reference's OWN torch code.

Builds the reference's networks (via tests/ref_shims — /root/reference +
timm/torchvision stand-ins), takes their REAL ``state_dict()``, imports it
through ``ckpt.torch_import.map_state_dict``, and compares forward outputs
against our flax implementation. Unlike tests/test_torch_import.py (which
round-trips our own exported names), this catches naming OR semantic
mismatches anywhere in the 6-submodule tree: a wrong BN eps, a missing
reflect pad, a misnamed disp head all fail here.

Covers: RepDepth composition (repdepth.py:19-624) — teacher
(replknet_adapter.py:381-627 + depth_decoder_v2.py:83-245), student with
cost volume (replk_matching_adapter.py:389-476), pose
(resnet_encoder.py:367-409 + pose_decoder.py:12-52) — plus the raw
ImageNet RepLKNet checkpoint layout (replknet.py:205-381) and the stage-2
decoder-adapter designs (depth_decoder_v2.py:135-245).

No released weights exist in /root/reference/ckpt, so random-init parity
at CPU-feasible sizes is the strongest available check (VERDICT item 2).
"""

from __future__ import annotations

import os
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ppeadepth_tpu.ckpt import torch_import as TI
from ppeadepth_tpu.models import RepDepth
from ppeadepth_tpu.models.depth_decoder import DepthDecoderV2
from ppeadepth_tpu.options import Config
from tests.ref_shims import load_reference

H, W = 64, 96
BINS = 16

OPT = Config(
    adapter=True, rep_size="b", use_checkpoint=False,
    height=H, width=W, num_depth_bins=BINS, bin_chunk=4, adpt_test=4,
)


def _nhwc(t):
    return np.asarray(t.detach()).transpose(0, 2, 3, 1)


def _perturb_special(module, seed=0):
    """Randomize the parts whose zero/identity init would mask naming bugs:
    zero-init adapter heads, deconv_adpt, and BN running statistics."""
    gen = torch.Generator().manual_seed(seed)
    for name, t in module.state_dict().items():
        if not torch.is_floating_point(t):
            continue
        if "running_mean" in name:
            t.normal_(0.0, 0.05, generator=gen)
        elif "running_var" in name:
            t.uniform_(0.8, 1.25, generator=gen)
        elif "D_fc2" in name or "deconv_adpt" in name or "D_fc1" in name:
            t.normal_(0.0, 0.02, generator=gen)


def _state_dict_np(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()
            if torch.is_floating_point(v)}


def _templates(model, init_fn):
    """Shape-only init (no compile) -> numpy-zeros param/stat templates."""
    shapes = jax.eval_shape(init_fn)
    to_np = lambda tree: jax.tree_util.tree_map(  # noqa: E731
        lambda s: np.zeros(s.shape, s.dtype), tree
    )
    return to_np(shapes["params"]), to_np(shapes.get("batch_stats", {}))


def _import_or_die(sd, tp, ts):
    params, stats, loaded, missing = TI.map_state_dict(sd, tp, ts)
    assert not missing, f"{len(missing)} unmapped leaves: {missing[:8]}"
    return {"params": params, "batch_stats": stats}


def _assert_close(a, b, what, atol=2e-4, rtol=1e-3):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    scale = max(np.abs(b).max(), 1e-6)
    err = np.abs(a - b).max()
    assert err <= atol + rtol * scale, (
        f"{what}: max|diff|={err:.3e} vs scale {scale:.3e}"
    )


# --------------------------------------------------------------------- #
# full RepDepth tree
# --------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def ref_nets():
    return load_reference()


@pytest.fixture(scope="module")
def ref_repdepth(ref_nets, tmp_path_factory):
    """Reference RepDepth with the live config (31B + type-4 adapters),
    pretrained load satisfied by an empty dummy .pth (strict=False)."""
    root = tmp_path_factory.mktemp("refmodel")
    (root / "pretrained").mkdir()
    torch.save({}, root / "pretrained" / "RepLKNet-31B_ImageNet-1K_224.pth")
    ns = SimpleNamespace(
        adapter=True, rep_size="b", use_checkpoint=False,
        trans=False, input=False, mono_trans=False, mono_input=False,
        adpt_test=4, g_blk=1.0, g_ffn=1.0, ratio=0.25,
        notadabins=False, depth_binning="log", num_depth_bins=BINS,
        scales=[0], debug=False, dc=False, dec_id=1, dec_ratio=0.25,
        fullft_reb=False, dec_only=False, lps2=False,
        pose_cnn=False, weights_init="scratch",
        use_future_frame=False, num_matching_frames=1,
        frame_ids=[0, -1, 1], height=H, width=W,
        min_depth=0.1, max_depth=100.0,
    )
    cwd = os.getcwd()
    os.chdir(root)
    try:
        torch.manual_seed(0)
        model = ref_nets.RepDepth(ns)
    finally:
        os.chdir(cwd)
    model.eval()
    _perturb_special(model)
    return model


@pytest.fixture(scope="module")
def ours(ref_repdepth):
    """Our RepDepth variables filled from the reference state_dict."""
    from tests.test_train_step import make_batch

    model = RepDepth(OPT)
    batch = make_batch(OPT, 1)
    rngs = {"params": jax.random.PRNGKey(0),
            "droppath": jax.random.PRNGKey(1),
            "aug": jax.random.PRNGKey(2)}
    tp, ts = _templates(
        model, lambda: model.init(rngs, batch, 0.1, 10.0, False)
    )
    sd = _state_dict_np(ref_repdepth)
    variables = _import_or_die(sd, tp, ts)
    return model, variables


def test_name_coverage_is_exact(ref_repdepth, ours):
    """Every torch leaf maps to exactly our tree and vice versa — a
    missing/extra key on either side is a checkpoint-format divergence."""
    model, variables = ours
    sd = set(_state_dict_np(ref_repdepth).keys())
    ex = set(TI.export_state_dict(
        variables["params"], variables["batch_stats"]).keys())
    # the torchvision classification head rides along in the reference
    # checkpoint but is dead weight (frozen and never called,
    # resnet_encoder.py:392-394); we intentionally don't carry it.
    dead = {"pose_encoder.encoder.fc.weight", "pose_encoder.encoder.fc.bias"}
    extra_torch = sorted(sd - ex - dead)
    extra_ours = sorted(ex - sd)
    assert not extra_torch, f"reference keys we never map: {extra_torch[:8]}"
    assert not extra_ours, f"our keys the reference lacks: {extra_ours[:8]}"


def test_teacher_forward_parity(ref_repdepth, ours):
    """mono_encoder.forward_features + mono_depth vs our forward_mono."""
    model, variables = ours
    gen = torch.Generator().manual_seed(1)
    x_t = torch.rand((1, 3, H, W), generator=gen)
    with torch.no_grad():
        feats_t = ref_repdepth.mono_encoder.forward_features(x_t)
        disp_t = ref_repdepth.mono_depth(feats_t)[("disp", 0)]

    x_j = jnp.asarray(_nhwc(x_t))
    feats_j = model.apply(
        variables, x_j, False,
        method=lambda m, x, tr: m.mono_encoder(x, tr),
    )
    for i, (ft, fj) in enumerate(zip(feats_t, feats_j)):
        _assert_close(fj, _nhwc(ft), f"teacher feats[{i}]")
    out_j = model.apply(variables, x_j, False, method=RepDepth.forward_mono)
    _assert_close(out_j[("disp", 0)][..., 0], np.asarray(disp_t)[:, 0],
                  "teacher disp", atol=1e-5)


def test_pose_forward_parity(ref_repdepth, ours):
    """pose_encoder + pose decoder + SE3 composition."""
    import ppeadepth.layers as ref_layers

    model, variables = ours
    gen = torch.Generator().manual_seed(2)
    a_t = torch.rand((2, 3, H, W), generator=gen)
    b_t = torch.rand((2, 3, H, W), generator=gen)
    with torch.no_grad():
        feats_t = ref_repdepth.pose_encoder(torch.cat([a_t, b_t], 1))
        aa_t, tr_t = ref_repdepth.pose([feats_t])
        T_t = ref_layers.transformation_from_parameters(
            aa_t[:, 0], tr_t[:, 0], invert=True
        )

    a_j, b_j = jnp.asarray(_nhwc(a_t)), jnp.asarray(_nhwc(b_t))
    aa_j, tr_j, T_j = model.apply(
        variables, a_j, b_j,
        method=lambda m, a, b: m._pose_pair(a, b, invert=True, train=False),
    )
    _assert_close(aa_j, np.asarray(aa_t), "axisangle", atol=1e-6)
    _assert_close(tr_j, np.asarray(tr_t), "translation", atol=1e-6)
    _assert_close(T_j, np.asarray(T_t), "cam_T_cam", atol=1e-6)


def test_student_forward_parity(ref_repdepth, ours):
    """Matching encoder (stem/stage0, plane-sweep cost volume, reduce_conv,
    stage re-entry) + student decoder."""
    model, variables = ours
    gen = torch.Generator().manual_seed(3)
    cur_t = torch.rand((1, 3, H, W), generator=gen)
    lk_t = torch.rand((1, 1, 3, H, W), generator=gen)
    # a small, nonzero relative pose
    import ppeadepth.layers as ref_layers

    aa = torch.tensor([[[0.01, -0.02, 0.005]]])  # [B=1, 1, 3]
    tr = torch.tensor([[[0.04, 0.01, -0.08]]])
    pose_t = ref_layers.transformation_from_parameters(
        aa, tr, invert=False
    )[:, None]  # [1, 1, 4, 4]

    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1] = 0.58 * W / 4, 1.92 * H / 4
    K[0, 2], K[1, 2] = 0.5 * W / 4, 0.5 * H / 4
    K_t = torch.from_numpy(K)[None]
    invK_t = torch.from_numpy(np.linalg.pinv(K))[None]

    with torch.no_grad():
        feats_t, lowest_t, conf_t = ref_repdepth.encoder(
            cur_t, lk_t, pose_t, K_t, invK_t,
            torch.tensor(0.1), torch.tensor(20.0),
        )
        disp_t = ref_repdepth.depth(feats_t)[("disp", 0)]

    out_j, lowest_j, conf_j = model.apply(
        variables,
        jnp.asarray(_nhwc(cur_t)),
        jnp.asarray(np.asarray(lk_t).transpose(0, 1, 3, 4, 2)),
        jnp.asarray(np.asarray(pose_t)),
        jnp.asarray(K)[None],
        jnp.asarray(np.linalg.pinv(K))[None],
        0.1, 20.0, False,
        method=RepDepth.forward_multi,
    )
    _assert_close(conf_j, np.asarray(conf_t), "confidence", atol=1e-6)
    _assert_close(lowest_j, np.asarray(lowest_t), "lowest_cost", atol=1e-4)
    _assert_close(out_j[("disp", 0)][..., 0], np.asarray(disp_t)[:, 0],
                  "student disp", atol=1e-5)


# --------------------------------------------------------------------- #
# raw ImageNet RepLKNet checkpoint layout (plain, no adapters)
# --------------------------------------------------------------------- #


def test_raw_imagenet_backbone_import(ref_nets):
    """The from-pretrained bootstrap: a PLAIN RepLKNet31B state_dict (the
    layout of RepLKNet-31B_ImageNet-1K_224.pth, replknet.py:205-381) must
    import into our backbone and produce identical features."""
    from ppeadepth_tpu.models.replknet import RepLKNet

    torch.manual_seed(4)
    ref = ref_nets.create_RepLKNet31B(
        drop_path_rate=0.3, num_classes=None, out_indices=(0, 1, 2, 3),
        use_checkpoint=False, small_kernel_merged=False,
        pretrained=None, use_sync_bn=False,
    ).eval()
    _perturb_special(ref, seed=4)

    model = RepLKNet(rep_size="b", use_checkpoint=False, adpt_test=-1)
    x = jnp.zeros((1, H, W, 3), jnp.float32)
    tp, ts = _templates(
        model,
        lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "droppath": jax.random.PRNGKey(1)}, x,
        ),
    )
    params, stats, loaded, missing = TI.map_state_dict(
        _state_dict_np(ref), tp, ts
    )
    assert not missing, missing[:8]

    gen = torch.Generator().manual_seed(5)
    x_t = torch.rand((1, 3, H, W), generator=gen)
    with torch.no_grad():
        feats_t = ref.forward_features(x_t)
    feats_j = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(_nhwc(x_t)), False,
    )
    for i, (ft, fj) in enumerate(zip(feats_t, feats_j)):
        _assert_close(fj, _nhwc(ft), f"backbone feats[{i}]")


# --------------------------------------------------------------------- #
# stage-2 decoder adapter designs
# --------------------------------------------------------------------- #


@pytest.mark.parametrize("dec_id", [1, 2, 3, 4, 8, 10])
def test_decoder_dc_designs_parity(ref_nets, dec_id):
    """DepthDecoderV2 dc designs (depth_decoder_v2.py:135-245) with the
    zero-init parts perturbed so the adapter path actually contributes."""
    ch = [16, 32, 64, 128]
    torch.manual_seed(10 + dec_id)
    ref = ref_nets.DepthDecoderV2(
        np.array(ch), scales=[0], debug=False, dc=True, test_id=dec_id
    ).eval()
    _perturb_special(ref, seed=10 + dec_id)

    gen = torch.Generator().manual_seed(20 + dec_id)
    h0, w0 = 16, 24
    feats_t = [
        torch.rand((1, ch[i], h0 // 2 ** i, w0 // 2 ** i), generator=gen)
        for i in range(4)
    ]

    model = DepthDecoderV2(tuple(ch), dc=True, dec_id=dec_id)
    feats_j = [jnp.asarray(_nhwc(f)) for f in feats_t]
    tp, ts = _templates(
        model,
        lambda: model.init({"params": jax.random.PRNGKey(0)}, feats_j),
    )
    variables = _import_or_die(_state_dict_np(ref), tp, ts)
    with torch.no_grad():
        disp_t = ref(feats_t)[("disp", 0)]
    disp_j = model.apply(variables, feats_j)[("disp", 0)]
    _assert_close(disp_j[..., 0], np.asarray(disp_t)[:, 0],
                  f"dc disp (dec_id={dec_id})", atol=1e-5)
