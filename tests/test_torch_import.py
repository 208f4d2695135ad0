"""torch<->jax checkpoint mapping: name goldens + round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

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


def test_exported_names_match_reference_convention():
    v = _variables()
    sd = TI.export_state_dict(v["params"], v["batch_stats"])
    expected = [
        "mono_encoder.stem.0.conv.weight",
        "mono_encoder.stem.0.bn.running_mean",
        "mono_encoder.stages.0.blocks.0.pw1.conv.weight",
        "mono_encoder.stages.0.blocks.0.large_kernel.lkb_origin.conv.weight",
        "mono_encoder.stages.0.blocks.0.large_kernel.small_conv.bn.weight",
        "mono_encoder.stages.0.blocks.0.adapter.D_fc2.weight",
        "mono_encoder.stages.0.blocks.1.mlp_adapter.D_fc1.weight",
        "mono_encoder.stages.0.blocks.0.prelkb_bn.weight",
        "mono_encoder.transitions.0.0.conv.weight",
        "mono_encoder.transitions.0.1.conv.weight",
        "encoder.replk.stem.0.conv.weight",
        "encoder.reduce_conv.0.weight",
        "encoder.reduce_conv.0.bias",
        "depth.upconvs_0.0.conv.conv.weight",
        "depth.upconvs_1.4.conv.conv.bias",
        "depth.disp_convs.0.conv.weight",
        "pose.net.0.weight",
        "pose.net.3.bias",
        "pose_encoder.encoder.conv1.weight",
        "pose_encoder.encoder.layer1.0.conv1.weight",
        "pose_encoder.encoder.layer2.0.downsample.0.weight",
        "pose_encoder.encoder.bn1.running_var",
    ]
    for name in expected:
        assert name in sd, f"missing torch name: {name}"
    # conv layout is OIHW on the torch side
    w = sd["mono_encoder.stem.0.conv.weight"]
    assert w.shape == (16, 3, 3, 3), w.shape
    # depthwise: [C, 1, kh, kw]
    dw = sd["mono_encoder.stages.0.blocks.0.large_kernel.lkb_origin.conv.weight"]
    assert dw.shape[1] == 1 and dw.shape[0] == 16, dw.shape


def test_roundtrip_identity():
    v = _variables()
    sd = TI.export_state_dict(v["params"], v["batch_stats"])
    zeros_p = jax.tree_util.tree_map(jnp.zeros_like, v["params"])
    zeros_s = jax.tree_util.tree_map(jnp.zeros_like, v["batch_stats"])
    params, stats, loaded, missing = TI.map_state_dict(sd, zeros_p, zeros_s)
    assert not missing, missing[:10]
    for a, b in zip(
        jax.tree_util.tree_leaves(v["params"]),
        jax.tree_util.tree_leaves(params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(v["batch_stats"]),
        jax.tree_util.tree_leaves(stats),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_pth_import(tmp_path):
    """Save a torch-style .pth from exported names, re-import through the
    torch loader (exercises torch.load + numpy conversion)."""
    import torch

    v = _variables()
    sd = TI.export_state_dict(v["params"], v["batch_stats"])
    tsd = {k: torch.from_numpy(np.ascontiguousarray(a)) for k, a in sd.items()}
    path = str(tmp_path / "model.pth")
    torch.save(tsd, path)
    params, stats, loaded, missing = TI.load_torch_repdepth(
        path, v["params"], v["batch_stats"], verbose=False
    )
    assert not missing
    assert loaded == len(sd)
