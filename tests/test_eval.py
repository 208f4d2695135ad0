"""Eval metric-pass tests (protocol goldens) + checkpoint round-trip."""

import numpy as np
import jax
import jax.numpy as jnp

from ppeadepth_tpu.eval import metrics as M


def test_compute_errors_known_values():
    gt = np.array([10.0, 20.0, 30.0])
    pred = np.array([11.0, 18.0, 30.0])
    abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3 = M.compute_errors(gt, pred)
    np.testing.assert_allclose(
        abs_rel, np.mean([1 / 10, 2 / 20, 0.0]), rtol=1e-6
    )
    np.testing.assert_allclose(
        sq_rel, np.mean([1 / 10, 4 / 20, 0.0]), rtol=1e-6
    )
    assert a1 == 1.0


def test_median_scaling_invariance(rng):
    """With median scaling, a globally scaled prediction gives identical
    metrics — the core of the self-supervised protocol."""
    gt = rng.rand(2, 100, 200).astype(np.float32) * 40 + 2
    disp = 1.0 / gt
    e1, r1 = M.evaluate_disps(disp, gt, eval_split="eigen")
    e2, r2 = M.evaluate_disps(disp * 7.5, gt, eval_split="eigen")
    np.testing.assert_allclose(e1, e2, atol=1e-5)
    np.testing.assert_allclose(r2 * 1.0, r1 * 7.5, rtol=1e-4)


def test_perfect_prediction_zero_error(rng):
    gt = rng.rand(1, 96, 320).astype(np.float32) * 40 + 2
    disp = 1.0 / gt
    errors, _ = M.evaluate_disps(disp, gt, eval_split="eigen")
    assert errors[0] < 1e-5 and errors[4] == 1.0


def test_cityscapes_crop_applied(rng):
    # GT 1024x2048; after 75% crop -> 768; then [256:, 192:1856]
    gt = rng.rand(1, 1024, 2048).astype(np.float32) * 40 + 2
    disp = 1.0 / (rng.rand(1, 192, 512).astype(np.float32) * 40 + 2)
    errors, _ = M.evaluate_disps(disp, gt, eval_split="cityscapes")
    assert np.isfinite(errors).all()


def test_checkpoint_roundtrip(tmp_path):
    from ppeadepth_tpu.options import Config
    from ppeadepth_tpu.models import RepDepth
    from ppeadepth_tpu.train import schedule
    from ppeadepth_tpu.train.step import create_train_state
    from ppeadepth_tpu.ckpt import io as ckpt_io
    from tests.test_train_step import make_batch

    opt = Config(adapter=True, rep_size="t", use_checkpoint=False,
                 height=64, width=96, num_depth_bins=8, bin_chunk=4)
    model = RepDepth(opt)
    batch = make_batch(opt, 2)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1),
         "aug": jax.random.PRNGKey(2)},
        batch, 0.1, 10.0, False,
    )
    tx = schedule.make_optimizer(1e-4, 100)
    state = create_train_state(model, variables, opt, tx)
    state = state.replace(min_depth_bin=jnp.asarray(0.23),
                          max_depth_bin=jnp.asarray(17.0))

    folder = str(tmp_path / "ckpt")
    ckpt_io.save_checkpoint(folder, state, opt)

    zero_params = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    params, stats, track = ckpt_io.load_model(
        folder, zero_params, state.batch_stats
    )
    orig = jax.tree_util.tree_leaves(state.params)
    loaded = jax.tree_util.tree_leaves(params)
    for a, b in zip(orig, loaded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert abs(track["min_depth_bin"] - 0.23) < 1e-6
    assert track["max_depth_bin"] == 17.0

    adam = ckpt_io.load_adam(folder, state.opt_state)
    assert jax.tree_util.tree_structure(adam) == jax.tree_util.tree_structure(
        state.opt_state
    )
