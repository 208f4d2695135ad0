"""Model-level tests: shapes, adapter zero-init identity, reparam merge
equivalence, ConvTranspose torch parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppeadepth_tpu.models.replknet import RepLKNet, ReparamLKConv
from ppeadepth_tpu.models.depth_decoder import (
    ConvTranspose3x3s2,
    DepthDecoderV2,
)
from ppeadepth_tpu.models.resnet import ResnetEncoder
from ppeadepth_tpu.models.pose import PoseDecoder
from ppeadepth_tpu.models.matching_encoder import RepLKMatching
from ppeadepth_tpu.kernels.lk_conv import merge_reparam_kernels

RNGS = {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1)}


def _strip_adapters(tree):
    """Remove adapter sub-trees so adapter-model params match plain model."""
    if not isinstance(tree, dict):
        return tree
    return {
        k: _strip_adapters(v)
        for k, v in tree.items()
        if k not in ("adapter", "mlp_adapter")
    }


def test_replknet_pyramid_shapes():
    model = RepLKNet(rep_size="t")
    x = jnp.zeros((2, 64, 96, 3))
    vars_ = model.init(RNGS, x, False)
    feats = model.apply(vars_, x, False)
    assert [f.shape for f in feats] == [
        (2, 16, 24, 16), (2, 8, 12, 32), (2, 4, 6, 64), (2, 2, 3, 128),
    ]


def test_adapter_zero_init_is_identity():
    """A freshly initialised adapter model must equal the plain backbone:
    every adapter's last projection is zero-init (replknet_adapter.py:
    482-508)."""
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 48, 3), jnp.float32)
    adpt = RepLKNet(rep_size="t", adpt_test=4)
    vars_a = adpt.init(RNGS, x, False)
    plain = RepLKNet(rep_size="t", adpt_test=-1)
    vars_p = {
        "params": _strip_adapters(vars_a["params"]),
        "batch_stats": vars_a["batch_stats"],
    }
    fa = adpt.apply(vars_a, x, False)
    fp = plain.apply(vars_p, x, False)
    for a, p in zip(fa, fp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(p), atol=1e-6)


def test_reparam_merge_equivalence():
    """Port of the reference's de-facto numerical test (replknet.py:400-412):
    merged deploy conv == large+small train branches, with BN folded."""
    rng = np.random.RandomState(0)
    C, k, sk = 8, 31, 5
    x = jnp.asarray(rng.rand(2, 40, 40, C).astype(np.float32))
    m_train = ReparamLKConv(C, k, sk)
    vars_t = m_train.init(RNGS, x, False)
    # randomise BN stats/affine so the fold is non-trivial
    p = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.rand(*a.shape).astype(np.float32) * 0.5 + 0.5),
        vars_t,
    )
    y_train = m_train.apply(p, x, False)

    def bn_dict(bn_params, bn_stats):
        return dict(
            scale=bn_params["scale"], bias=bn_params["bias"],
            mean=bn_stats["mean"], var=bn_stats["var"],
        )

    eq_k, eq_b = merge_reparam_kernels(
        p["params"]["lkb_origin"]["conv"]["kernel"],
        bn_dict(p["params"]["lkb_origin"]["bn"], p["batch_stats"]["lkb_origin"]["bn"]),
        p["params"]["small_conv"]["conv"]["kernel"],
        bn_dict(p["params"]["small_conv"]["bn"], p["batch_stats"]["small_conv"]["bn"]),
    )
    m_dep = ReparamLKConv(C, k, sk, merged=True)
    vars_d = {"params": {"lkb_reparam": {"kernel": eq_k, "bias": eq_b}}}
    y_dep = m_dep.apply(vars_d, x, False)
    np.testing.assert_allclose(
        np.asarray(y_train), np.asarray(y_dep), atol=2e-4
    )


def test_conv_transpose_parity():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    Cin = Cout = 6
    x = rng.rand(2, 5, 7, Cin).astype(np.float32)
    w = rng.randn(3, 3, Cin, Cout).astype(np.float32) * 0.2
    b = rng.randn(Cout).astype(np.float32)

    m = ConvTranspose3x3s2(Cout)
    y = m.apply({"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}},
                jnp.asarray(x))

    tm = torch.nn.ConvTranspose2d(Cin, Cout, 3, stride=2, padding=1,
                                  output_padding=1)
    with torch.no_grad():
        # torch weight layout [Cin, Cout, kh, kw]
        tm.weight.copy_(torch.from_numpy(w.transpose(2, 3, 0, 1)))
        tm.bias.copy_(torch.from_numpy(b))
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(y), ref.permute(0, 2, 3, 1).numpy(), atol=1e-5
    )


def test_depth_decoder_full_res_disp():
    ch = (16, 32, 64, 128)
    dec = DepthDecoderV2(ch)
    feats = [
        jnp.zeros((1, 16, 24, 16)), jnp.zeros((1, 8, 12, 32)),
        jnp.zeros((1, 4, 6, 64)), jnp.zeros((1, 2, 3, 128)),
    ]
    vars_ = dec.init(RNGS, feats, False)
    out = dec.apply(vars_, feats, False)
    disp = out[("disp", 0)]
    assert disp.shape == (1, 64, 96, 1)
    assert float(disp.min()) >= 0.0 and float(disp.max()) <= 1.0


def test_depth_decoder_dc_zero_init_identity():
    """dc adapters start at zero: stage-2 decoder == stage-1 decoder at
    bootstrap (repdepth.py:246-250 + zero-init adapter D_fc2)."""
    ch = (16, 32, 64, 128)
    rng = np.random.RandomState(1)
    feats = [
        jnp.asarray(rng.rand(1, 16, 24, 16), jnp.float32),
        jnp.asarray(rng.rand(1, 8, 12, 32), jnp.float32),
        jnp.asarray(rng.rand(1, 4, 6, 64), jnp.float32),
        jnp.asarray(rng.rand(1, 2, 3, 128), jnp.float32),
    ]
    dc = DepthDecoderV2(ch, dc=True, dec_id=1)
    vars_dc = dc.init(RNGS, feats, False)
    plain = DepthDecoderV2(ch)
    params_plain = {
        k: v for k, v in vars_dc["params"].items()
        if k not in ("adapter", "deconv_adpt")
    }
    out_dc = dc.apply(vars_dc, feats, False)[("disp", 0)]
    out_p = plain.apply({"params": params_plain}, feats, False)[("disp", 0)]
    np.testing.assert_allclose(np.asarray(out_dc), np.asarray(out_p), atol=1e-6)


def test_pose_path_shapes():
    enc = ResnetEncoder(num_layers=18, num_input_images=2)
    x = jnp.zeros((2, 64, 96, 6))
    vars_e = enc.init(RNGS, x, False)
    feats = enc.apply(vars_e, x, False)
    assert [f.shape[-1] for f in feats] == [64, 64, 128, 256, 512]
    dec = PoseDecoder(enc.num_ch_enc, 1, 2)
    vars_d = dec.init(RNGS, [feats])
    aa, tt = dec.apply(vars_d, [feats])
    assert aa.shape == (2, 2, 1, 3) and tt.shape == (2, 2, 1, 3)
    # outputs are 0.01-scaled -> small at init
    assert float(jnp.abs(aa).max()) < 0.5


def test_matching_encoder_shapes():
    m = RepLKMatching(rep_size="t", num_depth_bins=8, bin_chunk=4)
    B, H, W = 1, 64, 96
    cur = jnp.zeros((B, H, W, 3))
    lk = jnp.zeros((B, 1, H, W, 3))
    poses = jnp.broadcast_to(jnp.eye(4), (B, 1, 4, 4))
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 14.0, 30.0, W / 8, H / 8
    Kb = jnp.asarray(K[None])
    invKb = jnp.asarray(np.linalg.pinv(K)[None])
    vars_ = m.init(RNGS, cur, lk, poses, Kb, invKb, 0.1, 10.0, False)
    feats, lc, conf = m.apply(vars_, cur, lk, poses, Kb, invKb, 0.1, 10.0, False)
    assert [f.shape for f in feats] == [
        (1, 16, 24, 16), (1, 8, 12, 32), (1, 4, 6, 64), (1, 2, 3, 128),
    ]
    assert lc.shape == (1, 16, 24) and conf.shape == (1, 16, 24)


def test_bf16_compute_dtype():
    """bf16 compute policy: finite outputs close to the f32 model, params
    still f32, cost volume in f32."""
    import jax.numpy as jnp
    from ppeadepth_tpu.options import Config
    from ppeadepth_tpu.models.repdepth import RepDepth
    from tests.test_train_step import make_batch

    base = dict(adapter=True, rep_size="t", use_checkpoint=False,
                height=64, width=96, num_depth_bins=8, bin_chunk=4)
    batch = make_batch(Config(**base), 2)
    rngs = {"params": jax.random.PRNGKey(0),
            "droppath": jax.random.PRNGKey(1),
            "aug": jax.random.PRNGKey(2)}

    m32 = RepDepth(Config(**base, compute_dtype="float32"))
    v = m32.init(rngs, batch, 0.1, 10.0, False)
    mono32, out32 = m32.apply(v, batch, 0.1, 10.0, False)

    m16 = RepDepth(Config(**base, compute_dtype="bfloat16"))
    mono16, out16 = m16.apply(v, batch, 0.1, 10.0, False)

    assert all(a.dtype == jnp.float32
               for a in jax.tree_util.tree_leaves(v["params"]))
    d32 = np.asarray(mono32[("disp", 0)])
    d16 = np.asarray(mono16[("disp", 0)], dtype=np.float32)
    assert np.isfinite(d16).all()
    assert np.mean(np.abs(d32 - d16)) < 0.02


def test_conv3x3_equals_reflect_pad_conv():
    """Conv3x3's SAME-conv + border-strip form (blocks.py) must equal the
    reference's reflection-padded 3x3 conv (layers.py:119-135) in value
    AND gradient — the interior is the identical conv; the strips add
    the pad contributions (corners once). Guards the decoder redesign
    that removed the padded full-res buffer and its scatter-add bwd."""
    from ppeadepth_tpu.models.blocks import Conv3x3

    rng = np.random.RandomState(0)
    for (B, H, W, C, F) in [(2, 8, 10, 5, 7), (1, 2, 2, 3, 1)]:
        x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
        m = Conv3x3(F)
        v = m.init(jax.random.PRNGKey(0), x)
        k = v["params"]["conv"]["kernel"]
        b = v["params"]["conv"]["bias"]

        def ref(params, xin):
            xp = jnp.pad(xin, ((0, 0), (1, 1), (1, 1), (0, 0)),
                         mode="reflect")
            return jax.lax.conv_general_dilated(
                xp, params[0], (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + params[1]

        y = m.apply(v, x)
        yref = ref((k, b), x)
        np.testing.assert_allclose(y, yref, atol=1e-5)

        g1 = jax.grad(lambda p, xi: (m.apply({"params": p}, xi) ** 2).sum(),
                      argnums=(0, 1))(v["params"], x)
        g2 = jax.grad(lambda p, xi: (ref(p, xi) ** 2).sum(),
                      argnums=(0, 1))((k, b), x)
        np.testing.assert_allclose(
            g1[0]["conv"]["kernel"], g2[0][0], rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(
            g1[0]["conv"]["bias"], g2[0][1], rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(g1[1], g2[1], rtol=1e-5, atol=1e-4)
