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
