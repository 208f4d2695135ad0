"""Banded (Toeplitz) MXU depthwise conv: kernels/banded_conv.py.

Equivalence vs the lax depthwise lowering (interpret mode on CPU), the
weight-table transforms, backend resolution, and the deploy-form model
integration through ckpt/deploy.banded_tables. On-device timing lives
in tools/probe_banded2.py (stage0 1.52x / stage1 2.61x vs lax at B=8
640x192, BENCHMARKS.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppeadepth_tpu.kernels import banded_conv, lk_conv


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.mark.parametrize("k,W", [(5, 8), (7, 16), (13, 24)])
@pytest.mark.parametrize("transposed", [False, True])
def test_banded_matches_lax(rng, k, W, transposed):
    B, H, C = 8, 6, 12
    x = jnp.asarray((rng.rand(B, H, W, C) - 0.5).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, 1, C).astype(np.float32) * 0.1)
    build = banded_conv.build_T_t if transposed else banded_conv.build_T
    T = build(w, W)
    o_b = banded_conv.banded_depthwise(x, T, k, interpret=True)
    o_l = lk_conv._depthwise_lax(x, w, 1, k // 2)
    np.testing.assert_allclose(
        np.asarray(o_b), np.asarray(o_l), rtol=0, atol=1e-5)


@pytest.mark.parametrize("B", [4, 12])
def test_banded_offset4_batches_match_lax(rng, B):
    """B % 8 == 4 exercises the offset-4 residue-class accumulators
    (aligned slice 4 rows early + shifted read-back)."""
    k, W, H, C = 7, 16, 6, 12
    x = jnp.asarray((rng.rand(B, H, W, C) - 0.5).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, 1, C).astype(np.float32) * 0.1)
    T = banded_conv.build_T_t(w, W)
    o_b = banded_conv.banded_depthwise(x, T, k, interpret=True)
    o_l = lk_conv._depthwise_lax(x, w, 1, k // 2)
    np.testing.assert_allclose(
        np.asarray(o_b), np.asarray(o_l), rtol=0, atol=1e-5)


def test_build_T_t_mm_matches_gather(rng):
    """The in-jit matmul build (training path) is bit-identical to the
    gather build (exactly one indicator matches per entry)."""
    for k, W in ((5, 8), (13, 24)):
        w = jnp.asarray(rng.randn(k, k, 1, 6).astype(np.float32))
        a = np.asarray(banded_conv.build_T_t(w, W))
        b = np.asarray(banded_conv.build_T_t_mm(w, W))
        np.testing.assert_array_equal(a, b)


def test_banded_train_value_and_grads_match_lax(rng):
    """banded_depthwise_train: forward, d/dx AND d/dw equal the lax
    depthwise conv's (f32 tables, interpret mode)."""
    k, B, H, W, C = 5, 12, 6, 16, 8
    x = jnp.asarray((rng.rand(B, H, W, C) - 0.5).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, 1, C).astype(np.float32) * 0.1)
    cot = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))

    def f_banded(x_, w_):
        y = banded_conv.banded_depthwise_train(
            x_, w_, k, True, jnp.float32)
        return jnp.sum(y * cot)

    def f_lax(x_, w_):
        y = lk_conv._depthwise_lax(x_, w_, 1, k // 2)
        return jnp.sum(y * cot)

    vb, (dxb, dwb) = jax.value_and_grad(f_banded, argnums=(0, 1))(x, w)
    vl, (dxl, dwl) = jax.value_and_grad(f_lax, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(float(vb), float(vl), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dxb), np.asarray(dxl), rtol=0, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(dwb), np.asarray(dwl), rtol=0, atol=1e-4)


def test_train_model_banded_matches_lax(rng):
    """Tiny RepLKNet in TRAIN mode: lk_train_backend='banded' (f32-ish
    tolerances — tables are bf16 by default) produces the lax forward
    and gradients flow to the same leaves."""
    from ppeadepth_tpu.models.replknet import RepLKNet

    H, W = 16, 32  # stage widths 8, 4 — stage0 banded, stage1 W%8!=0
    x = jnp.asarray(rng.rand(4, H, W, 3).astype(np.float32))
    kw = dict(rep_size="t", drop_path_rate=0.0)
    m_lax = RepLKNet(lk_train_backend="lax", **kw)
    m_band = RepLKNet(lk_train_backend="banded", **kw)
    variables = m_lax.init(
        {"params": jax.random.PRNGKey(0),
         "droppath": jax.random.PRNGKey(1)}, x, True)

    def loss(mdl, params):
        out, _ = mdl.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, True, mutable=["batch_stats"],
            rngs={"droppath": jax.random.PRNGKey(2)})
        # smooth loss: |.| would amplify near-zero sign flips from
        # reordered summation into O(1) per-element grad diffs
        return sum(jnp.mean(o * o) for o in
                   jax.tree_util.tree_leaves(out))

    vl, gl = jax.value_and_grad(lambda p: loss(m_lax, p))(
        variables["params"])
    vb, gb = jax.value_and_grad(lambda p: loss(m_band, p))(
        variables["params"])
    np.testing.assert_allclose(float(vb), float(vl), rtol=5e-3)
    fl = jax.tree_util.tree_leaves_with_path(gl)
    fb = {jax.tree_util.keystr(kp): v
          for kp, v in jax.tree_util.tree_leaves_with_path(gb)}
    for kp, v in fl:
        b = fb[jax.tree_util.keystr(kp)]
        denom = np.abs(np.asarray(v)).max() + 1e-3
        err = np.abs(np.asarray(b) - np.asarray(v)).max() / denom
        assert err < 0.05, (jax.tree_util.keystr(kp), err)


def test_build_T_layouts_agree(rng):
    k, W, C = 5, 16, 3
    w = jnp.asarray(rng.randn(k, k, 1, C).astype(np.float32))
    T = banded_conv.build_T(w, W)          # [C, k*W_in, W_out]
    Tt = banded_conv.build_T_t(w, W)       # [C, W_out, k*W_in]
    assert T.shape == (C, k * W, W)
    assert Tt.shape == (C, W, k * W)
    re = jnp.transpose(
        Tt.reshape(C, W, k, W), (0, 2, 3, 1)).reshape(C, k * W, W)
    np.testing.assert_array_equal(np.asarray(T), np.asarray(re))


def test_band_is_zero_padding(rng):
    """Truncated diagonals == SAME zero padding: off-band entries are 0
    and each w_out column holds exactly the in-range taps."""
    k, W = 5, 8
    w = jnp.ones((k, k, 1, 1), jnp.float32)
    T = np.asarray(banded_conv.build_T(w, W))[0].reshape(k, W, W)
    half = k // 2
    for dy in range(k):
        for wi in range(W):
            for wo in range(W):
                expect = 1.0 if abs(wi - wo) <= half else 0.0
                assert T[dy, wi, wo] == expect


def test_stage_backends_and_resolve():
    assert banded_conv.stage_backends("auto") == [
        "auto", "auto", "lax", "lax"]
    assert banded_conv.stage_backends("lax") == ["lax"] * 4
    assert banded_conv.stage_backends("banded,banded,lax,lax") == [
        "banded", "banded", "lax", "lax"]
    # 'auto' only turns on for merged bf16 TPU
    on_tpu = jax.default_backend() == "tpu"
    expect = "banded" if on_tpu else "lax"
    assert banded_conv.resolve_lk_deploy_backend(
        "auto", True, jnp.bfloat16) == expect
    assert banded_conv.resolve_lk_deploy_backend(
        "auto", False, jnp.bfloat16) == "lax"
    assert banded_conv.resolve_lk_deploy_backend(
        "auto", True, jnp.float32) == "lax"
    assert banded_conv.resolve_lk_deploy_backend(
        "banded", False, jnp.float32) == "banded"  # explicit wins
    # training resolve: 'auto' only on TPU bf16; explicit wins
    expect_t = "banded" if on_tpu else "lax"
    assert banded_conv.resolve_lk_train_backend(
        "auto", jnp.bfloat16) == expect_t
    assert banded_conv.resolve_lk_train_backend(
        "auto", jnp.float32) == "lax"
    assert banded_conv.resolve_lk_train_backend(
        "banded", jnp.float32) == "banded"


def test_deploy_model_banded_matches_lax(rng):
    """Tiny merged RepLKNet: the banded backend + banded_tables produce
    the lax-merged forward (CPU interpret path; f32 tables)."""
    from ppeadepth_tpu.ckpt.deploy import banded_tables, structural_reparam
    from ppeadepth_tpu.models.replknet import RepLKNet

    H, W = 32, 64  # stage widths 16, 8 — both % 8 == 0
    x = jnp.asarray(rng.rand(8, H, W, 3).astype(np.float32))
    train_model = RepLKNet(rep_size="t", drop_path_rate=0.0)
    variables = train_model.init(
        {"params": jax.random.PRNGKey(0),
         "droppath": jax.random.PRNGKey(1)}, x)
    mp, ms = structural_reparam(
        variables["params"], variables["batch_stats"])

    lax_model = RepLKNet(rep_size="t", drop_path_rate=0.0, merged=True,
                         lk_deploy_backend="lax")
    banded_model = RepLKNet(rep_size="t", drop_path_rate=0.0, merged=True,
                            lk_deploy_backend="banded")
    bt = banded_tables(mp, (H, W), dtype=jnp.float32)
    # one table per stage-0/1 LK conv of the tiny config (1 + 1 blocks)
    assert len(jax.tree_util.tree_leaves(bt)) == 2

    v_lax = {"params": mp, "batch_stats": ms}
    v_banded = {"params": mp, "batch_stats": ms, "banded": bt}
    o_lax = lax_model.apply(v_lax, x, False)
    o_banded = banded_model.apply(v_banded, x, False)
    for a, b in zip(jax.tree_util.tree_leaves(o_lax),
                    jax.tree_util.tree_leaves(o_banded)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=2e-4)

    # without tables the banded model must silently fall back to lax
    o_fallback = banded_model.apply(v_lax, x, False)
    for a, b in zip(jax.tree_util.tree_leaves(o_lax),
                    jax.tree_util.tree_leaves(o_fallback)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_banded_tables_resolution_mismatch_falls_back(rng):
    """Tables built for another resolution are ignored (shape check)."""
    from ppeadepth_tpu.ckpt.deploy import banded_tables, structural_reparam
    from ppeadepth_tpu.models.replknet import RepLKNet

    H, W = 32, 64
    x = jnp.asarray(rng.rand(8, H, W, 3).astype(np.float32))
    train_model = RepLKNet(rep_size="t", drop_path_rate=0.0)
    variables = train_model.init(
        {"params": jax.random.PRNGKey(0),
         "droppath": jax.random.PRNGKey(1)}, x)
    mp, ms = structural_reparam(
        variables["params"], variables["batch_stats"])
    banded_model = RepLKNet(rep_size="t", drop_path_rate=0.0, merged=True,
                            lk_deploy_backend="banded")
    bt_wrong = banded_tables(mp, (H, W * 2), dtype=jnp.float32)
    o_ref = banded_model.apply({"params": mp, "batch_stats": ms}, x, False)
    o_wrong = banded_model.apply(
        {"params": mp, "batch_stats": ms, "banded": bt_wrong}, x, False)
    for a, b in zip(jax.tree_util.tree_leaves(o_ref),
                    jax.tree_util.tree_leaves(o_wrong)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
