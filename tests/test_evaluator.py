"""Evaluator e2e on CPU with a synthetic val set + GT."""

import jax
import jax.numpy as jnp
import numpy as np

from ppeadepth_tpu.eval import evaluator
from ppeadepth_tpu.models import RepDepth
from ppeadepth_tpu.options import Config


def test_run_eval_end_to_end(rng):
    opt = Config(adapter=True, rep_size="t", use_checkpoint=False,
                 height=64, width=96, num_depth_bins=8, bin_chunk=4,
                 eval_split="eigen")
    model = RepDepth(opt)
    from tests.test_train_step import make_batch

    init_batch = make_batch(opt, 2)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1),
         "aug": jax.random.PRNGKey(2)},
        init_batch, 0.1, 10.0, False,
    )

    def val_batches():
        for _ in range(2):
            b = {}
            b[("color", 0, 0)] = rng.rand(2, 64, 96, 3).astype(np.float32)
            b[("color", -1, 0)] = rng.rand(2, 64, 96, 3).astype(np.float32)
            K = np.eye(4, dtype=np.float32)
            K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 14.0, 30.0, 12.0, 8.0
            b[("K", 2)] = np.stack([K] * 2)
            b[("inv_K", 2)] = np.stack([np.linalg.pinv(K)] * 2)
            yield b

    gt = [rng.rand(128, 192).astype(np.float32) * 40 + 2 for _ in range(4)]
    errors, mono_errors = evaluator.run_eval(
        model, variables, opt, val_batches(),
        with_teacher=True, gt_depths=gt,
    )
    assert errors.shape == (7,)
    assert np.isfinite(errors).all()
    assert mono_errors is not None and np.isfinite(mono_errors).all()
    # random model, median-scaled: a1 in (0, 1]
    assert 0.0 <= errors[4] <= 1.0


def test_run_eval_sharded_over_mesh(rng):
    """dp-sharded eval with a partial final batch (pad + drop)."""
    from ppeadepth_tpu.parallel import mesh as M

    opt = Config(adapter=True, rep_size="t", use_checkpoint=False,
                 height=64, width=96, num_depth_bins=8, bin_chunk=4,
                 eval_split="eigen")
    model = RepDepth(opt)
    from tests.test_train_step import make_batch

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1),
         "aug": jax.random.PRNGKey(2)},
        make_batch(opt, 2), 0.1, 10.0, False,
    )

    def val_batches():
        for n in (8, 3):  # full batch then a partial one
            b = {}
            b[("color", 0, 0)] = rng.rand(n, 64, 96, 3).astype(np.float32)
            b[("color", -1, 0)] = rng.rand(n, 64, 96, 3).astype(np.float32)
            K = np.eye(4, dtype=np.float32)
            K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 14.0, 30.0, 12.0, 8.0
            b[("K", 2)] = np.stack([K] * n)
            b[("inv_K", 2)] = np.stack([np.linalg.pinv(K)] * n)
            yield b

    gt = [rng.rand(128, 192).astype(np.float32) * 40 + 2 for _ in range(11)]
    mesh = M.make_mesh(8)
    errors, _ = evaluator.run_eval(
        model, variables, opt, val_batches(), gt_depths=gt, mesh=mesh,
    )
    assert errors.shape == (7,) and np.isfinite(errors).all()


def test_run_eval_post_process(rng):
    """Flip TTA path: same shapes, finite metrics."""
    opt = Config(adapter=True, rep_size="t", use_checkpoint=False,
                 height=64, width=96, num_depth_bins=8, bin_chunk=4,
                 eval_split="eigen", post_process=True)
    model = RepDepth(opt)
    from tests.test_train_step import make_batch

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1),
         "aug": jax.random.PRNGKey(2)},
        make_batch(opt, 2), 0.1, 10.0, False,
    )

    def val_batches():
        b = {}
        b[("color", 0, 0)] = rng.rand(2, 64, 96, 3).astype(np.float32)
        b[("color", -1, 0)] = rng.rand(2, 64, 96, 3).astype(np.float32)
        K = np.eye(4, dtype=np.float32)
        K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 14.0, 30.0, 12.0, 8.0
        b[("K", 2)] = np.stack([K] * 2)
        b[("inv_K", 2)] = np.stack([np.linalg.pinv(K)] * 2)
        yield b

    gt = [rng.rand(128, 192).astype(np.float32) * 40 + 2 for _ in range(2)]
    errors, _ = evaluator.run_eval(
        model, variables, opt, val_batches(), gt_depths=gt,
    )
    assert errors.shape == (7,) and np.isfinite(errors).all()
