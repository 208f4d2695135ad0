"""Tests for legacy matching encoder/decoder, ablation harness,
occlusion fill, warmup schedule, misc utils."""

import jax
import jax.numpy as jnp
import numpy as np

from ppeadepth_tpu.models.resnet_matching import (
    DepthDecoder,
    ResnetEncoderMatching,
)
from ppeadepth_tpu.ops import cost_volume as CV
from ppeadepth_tpu.train.schedule import step_lr, warmup_step_lr
from ppeadepth_tpu.utils.misc import sec_to_hm_str

RNGS = {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1)}


def test_legacy_matching_encoder_shapes():
    m = ResnetEncoderMatching(num_depth_bins=8, bin_chunk=4)
    B, H, W = 1, 64, 96
    cur = jnp.zeros((B, H, W, 3))
    lk = jnp.zeros((B, 1, H, W, 3))
    poses = jnp.broadcast_to(jnp.eye(4), (B, 1, 4, 4))
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 14.0, 30.0, W / 8, H / 8
    Kb, invKb = jnp.asarray(K[None]), jnp.asarray(np.linalg.pinv(K)[None])
    vars_ = m.init(RNGS, cur, lk, poses, Kb, invKb, 0.1, 10.0, False)
    feats, lc, conf = m.apply(vars_, cur, lk, poses, Kb, invKb, 0.1, 10.0, False)
    assert [f.shape for f in feats] == [
        (1, 32, 48, 64), (1, 16, 24, 64), (1, 8, 12, 128),
        (1, 4, 6, 256), (1, 2, 3, 512),
    ]
    assert lc.shape == (1, 16, 24)


def test_legacy_decoder_multiscale():
    dec = DepthDecoder()
    feats = [
        jnp.zeros((1, 32, 48, 64)), jnp.zeros((1, 16, 24, 64)),
        jnp.zeros((1, 8, 12, 128)), jnp.zeros((1, 4, 6, 256)),
        jnp.zeros((1, 2, 3, 512)),
    ]
    vars_ = dec.init(RNGS, feats, False)
    out = dec.apply(vars_, feats, False)
    assert set(out) == {("disp", s) for s in range(4)}
    assert out[("disp", 0)].shape == (1, 64, 96, 1)
    assert out[("disp", 3)].shape == (1, 8, 12, 1)


def test_ablation_zeroing():
    from ppeadepth_tpu.eval import ablation
    from ppeadepth_tpu.models.replknet import RepLKNet

    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 48, 3), jnp.float32)
    model = RepLKNet(rep_size="t", adpt_test=4)
    vars_ = model.init(RNGS, x, False)
    # make adapters non-trivial so ablation changes outputs
    params = jax.tree_util.tree_map(
        lambda a: a + 0.05, vars_["params"]
    )
    blocks = ablation.adapter_block_paths(params, "stages_0")
    assert blocks, "no adapter blocks found"
    base = model.apply(
        {"params": params, "batch_stats": vars_["batch_stats"]}, x, False
    )
    ablated_params = ablation.zero_adapter(params, blocks[0])
    out = model.apply(
        {"params": ablated_params, "batch_stats": vars_["batch_stats"]},
        x, False,
    )
    assert not np.allclose(np.asarray(base[0]), np.asarray(out[0]))


def test_dyn_cost_volume_modes(rng):
    """Smoke of plane_sweep_cost_volume_dyn's in-fill gating (the
    executable-reference parity lives in tests/test_dyn_cv_oracle.py):
    a fully-black lookup image is fully occluded, so with set_1 the
    central warped features become 1.0 and the diff shifts; under
    matching augmentation the in-fill is skipped entirely."""
    B, D, h, w = 1, 4, 8, 12
    H, W = 32, 48
    cur = jnp.asarray(rng.rand(B, h, w, 5).astype(np.float32) * 0.3)
    lk_feats = jnp.asarray(rng.rand(B, 1, h, w, 5).astype(np.float32) * 0.3)
    lookup = jnp.zeros((B, 1, H, W, 3))  # fully black = fully occluded
    poses = jnp.broadcast_to(jnp.eye(4), (B, 1, 4, 4)) + 1e-6
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 5.0, 5.0, w / 2, h / 2
    Kj = jnp.asarray(K[None])
    iK = jnp.asarray(np.linalg.pinv(K)[None])
    bins = CV.compute_depth_bins(1.0, 10.0, D)

    base, _ = CV.plane_sweep_cost_volume_dyn(
        cur, lk_feats, poses, Kj, iK, bins, lookup,
        jnp.zeros((B, 1, 1, 1)), set_1=False, pool=False)
    filled, _ = CV.plane_sweep_cost_volume_dyn(
        cur, lk_feats, poses, Kj, iK, bins, lookup,
        jnp.zeros((B, 1, 1, 1)), set_1=True, pool=False)
    # in-fill rewrote occluded warped features to 1.0 -> cost ~|1 - cur|
    assert not np.allclose(np.asarray(base), np.asarray(filled))
    center = np.asarray(filled)[0, :, 3:-3, 3:-3]
    assert center.mean() > np.asarray(base)[0, :, 3:-3, 3:-3].mean()
    # under augmentation the in-fill is skipped: identical to no-fill
    aug, _ = CV.plane_sweep_cost_volume_dyn(
        cur, lk_feats, poses, Kj, iK, bins, lookup,
        jnp.ones((B, 1, 1, 1)), set_1=True, pool=False)
    np.testing.assert_allclose(np.asarray(aug), np.asarray(base))


def test_schedules():
    s = step_lr(1e-4, steps_per_epoch=10, step_size_epochs=2, gamma=0.1)
    assert s(0) == 1e-4 and s(19) == 1e-4
    np.testing.assert_allclose(s(20), 1e-5, rtol=1e-6)
    w = warmup_step_lr(1e-4, 10, warmup_steps=10, warmup_factor=0.1,
                       step_size_epochs=100)
    np.testing.assert_allclose(float(w(0)), 1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(w(10)), 1e-4, rtol=1e-5)


def test_sec_to_hm_str():
    assert sec_to_hm_str(10239) == "02h50m39s"
