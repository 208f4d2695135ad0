"""Train-step tests: freeze partition, overfit-one-batch, DP equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppeadepth_tpu.options import Config
from ppeadepth_tpu.models import RepDepth
from ppeadepth_tpu.train import freeze, schedule
from ppeadepth_tpu.train.step import TrainState, create_train_state, make_train_step
from ppeadepth_tpu.parallel import mesh as M

TINY = Config(
    adapter=True, rep_size="t", use_checkpoint=False,
    height=64, width=96, batch_size=8, num_depth_bins=8, bin_chunk=4,
    adpt_test=4, no_matching_augmentation=False,
)


def make_batch(opt, B, seed=0):
    rng = np.random.RandomState(seed)
    H, W = opt.height, opt.width
    batch = {}
    base = rng.rand(H, W + 8, 3).astype(np.float32)
    for _ in range(3):
        base = 0.5 * base + 0.25 * np.roll(base, 1, 1) + 0.25 * np.roll(base, -1, 1)
    frames = {0: base[:, 4:-4], -1: base[:, :-8], 1: base[:, 8:]}
    for f in (0, -1, 1):
        img = np.stack([frames[f]] * B)
        img += rng.rand(B, H, W, 3).astype(np.float32) * 0.01
        batch[("color", f, 0)] = jnp.asarray(img)
        batch[("color_aug", f, 0)] = jnp.asarray(img)
    for s in (0, 2):
        K = np.eye(4, dtype=np.float32)
        sc = 2 ** s
        K[0, 0], K[1, 1] = 0.58 * W / sc, 1.92 * H / sc
        K[0, 2], K[1, 2] = 0.5 * W / sc, 0.5 * H / sc
        batch[("K", s)] = jnp.asarray(np.stack([K] * B))
        batch[("inv_K", s)] = jnp.asarray(np.stack([np.linalg.pinv(K)] * B))
    return batch


def init_model_state(opt, B):
    model = RepDepth(opt)
    batch = make_batch(opt, B)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1),
         "aug": jax.random.PRNGKey(2)},
        batch, 0.1, 10.0, False,
    )
    tx = schedule.make_optimizer(1e-4, steps_per_epoch=100)
    state = create_train_state(model, variables, opt, tx)
    return model, state, tx, batch


def test_freeze_labels_stage1():
    model, state, _, _ = init_model_state(TINY, 2)
    params = freeze.merge(state.trainable, state.frozen)
    labels = freeze.param_labels(params, TINY)
    flat_p = {"/".join(k): v for k, v in
              __import__("flax").traverse_util.flatten_dict(params).items()}
    flat_l = {"/".join(k): v for k, v in
              __import__("flax").traverse_util.flatten_dict(labels).items()}
    # backbone conv kernels frozen; adapters/bn/reduce trainable
    assert flat_l["encoder/replk/stages_0/blocks_0/pw1/conv/kernel"] == "frozen"
    assert flat_l["encoder/replk/stages_0/blocks_0/pw1/bn/scale"] == "trainable"
    assert flat_l["encoder/replk/stages_0/blocks_0/adapter/D_fc1/kernel"] == "trainable"
    assert flat_l["encoder/reduce_conv/kernel"] == "trainable"
    assert flat_l["mono_encoder/stages_0/blocks_0/pw1/conv/kernel"] == "frozen"
    # decoders + pose fully trainable in stage 1
    for k, v in flat_l.items():
        if k.startswith(("depth/", "mono_depth/", "pose")):
            assert v == "trainable", k
    # trainable fraction is small (PEA design)
    n_train = freeze.count_params(state.trainable)
    n_total = n_train + freeze.count_params(state.frozen)
    assert n_train < n_total


def test_freeze_labels_stage2_dc():
    opt = TINY.replace(dc=True, dec_id=1)
    model = RepDepth(opt)
    batch = make_batch(opt, 2)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1),
         "aug": jax.random.PRNGKey(2)},
        batch, 0.1, 10.0, False,
    )
    labels = freeze.param_labels(variables["params"], opt)
    import flax
    flat_l = {"/".join(k): v
              for k, v in flax.traverse_util.flatten_dict(labels).items()}
    assert flat_l["depth/adapter/D_fc1/kernel"] == "trainable"
    assert flat_l["depth/deconv_adpt/kernel"] == "trainable"
    # everything non-adapter in the decoders is frozen in stage 2
    assert flat_l["depth/upconvs_0_0/conv/conv/kernel"] == "frozen"
    assert flat_l["depth/disp_conv/conv/kernel"] == "frozen"


def test_overfit_one_batch():
    """Loss decreases over a few steps on a fixed synthetic batch."""
    opt = TINY.replace(no_matching_augmentation=True)
    model, state, tx, batch = init_model_state(opt, 4)
    batch = make_batch(opt, 4)
    step_fn = make_train_step(model, opt, tx, donate=False)
    losses = []
    for i in range(6):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(100 + i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
    # depth bins moved off their defaults
    assert float(state.max_depth_bin) != 10.0


def test_dp_equivalence():
    """8-device dp-sharded step == single-device step (same math)."""
    assert len(jax.devices()) >= 8
    opt = TINY.replace(no_matching_augmentation=True)
    model, state, tx, _ = init_model_state(opt, 8)
    batch = make_batch(opt, 8)
    step_fn = make_train_step(model, opt, tx, donate=False)
    rng = jax.random.PRNGKey(7)

    _, m_single = step_fn(state, batch, rng)

    mesh = M.make_mesh(8)
    state_r = M.replicate(state, mesh)
    batch_s = M.shard_batch(batch, mesh)
    _, m_dp = step_fn(state_r, batch_s, rng)

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_dp["loss"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(m_single["depth_bins/max"]), float(m_dp["depth_bins/max"]),
        rtol=1e-5,
    )


def test_blank_frame_zero_pose():
    """Missing-frame protocol: a blank lookup frame must produce a zero
    relative pose (repdepth.py:502-506) so the cost volume skips it."""
    from ppeadepth_tpu.models import RepDepth

    opt = TINY
    model = RepDepth(opt)
    batch = make_batch(opt, 2)
    # blank out frame -1 of sample 1 (color_aug drives pose + blanks)
    for s in (0,):
        batch[("color_aug", -1, s)] = (
            batch[("color_aug", -1, s)].at[1].set(0.0)
        )
    variables = RepDepth(opt).init(
        {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1),
         "aug": jax.random.PRNGKey(2)},
        batch, 0.1, 10.0, False,
    )
    poses = model.apply(
        variables, batch, False, False,
        method=lambda m, b, train, sg: m.predict_poses(b, train, sg),
    )
    rel = np.asarray(poses[("relative_pose", -1)])
    assert np.abs(rel[1]).sum() == 0.0  # blank frame -> zero pose
    assert np.abs(rel[0]).sum() > 0.0


def test_chained_matching_poses_multi_frame():
    """num_matching_frames=2: pose 0->-2 is chained through -1
    (repdepth.py:472-500); use_future_frame adds +1."""
    from ppeadepth_tpu.models import RepDepth
    from ppeadepth_tpu.core.geometry import transformation_from_parameters

    opt = TINY.replace(num_matching_frames=2, use_future_frame=True)
    assert opt.matching_ids == (0, 1, -1, -2)
    batch = make_batch(opt, 2)
    rng = np.random.RandomState(3)
    for f in (-2,):
        img = rng.rand(2, opt.height, opt.width, 3).astype(np.float32)
        batch[("color", f, 0)] = jnp.asarray(img)
        batch[("color_aug", f, 0)] = jnp.asarray(img)
    model = RepDepth(opt)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1),
         "aug": jax.random.PRNGKey(2)},
        batch, 0.1, 10.0, False,
    )
    poses = model.apply(
        variables, batch, False, False,
        method=lambda m, b, train, sg: m.predict_poses(b, train, sg),
    )
    for fi in (1, -1, -2):
        assert ("relative_pose", fi) in poses
        T = np.asarray(poses[("relative_pose", fi)])
        assert T.shape == (2, 4, 4)
        np.testing.assert_allclose(T[:, 3], [[0, 0, 0, 1]] * 2, atol=1e-5)
    # chain check: T(0->-2) should differ from T(0->-1) (extra hop applied)
    assert not np.allclose(
        poses[("relative_pose", -2)], poses[("relative_pose", -1)]
    )


def test_remat_loss_equivalence():
    """--remat_loss (and --remat_policy save_warps) must not change the
    loss OR the gradients (they only trade HBM for recompute / saved
    warp residuals in the backward pass).

    Gradients, not post-Adam params: Adam's per-element normalization
    turns reassociation-level grad noise on near-zero elements into
    O(lr) update differences (observed: sign flips on a 16-element
    zero-init adapter bias), so the update is ill-conditioned as an
    equivalence metric. Per-leaf norm-relative grad comparison is the
    well-conditioned check."""
    from ppeadepth_tpu.train.step import make_loss_fn

    opt = TINY
    model, state, _, batch = init_model_state(opt, 2)
    rng = jax.random.PRNGKey(3)
    results = {}
    variants = {
        "none": dict(remat_loss=False),
        "full": dict(remat_loss=True),
        "save_warps": dict(remat_loss=True, remat_policy="save_warps"),
    }
    for name, kw in variants.items():
        o = opt.replace(**kw)
        loss_fn = make_loss_fn(model, o)
        grad_fn = jax.jit(jax.value_and_grad(loss_fn, argnums=0,
                                             has_aux=True))
        (loss, _), grads = grad_fn(
            state.trainable, state.frozen, state.batch_stats, batch,
            state.min_depth_bin, state.max_depth_bin, rng)
        results[name] = (float(loss), jax.tree_util.tree_map(
            np.asarray, grads))
    base_loss, base_grads = results["none"]
    assert np.isfinite(base_loss)
    base_leaves = jax.tree_util.tree_leaves(base_grads)
    # floor for numerically-zero leaves (seen: a leaf at |g|=1.7e-9 vs a
    # global grad norm of ~1e-1 — pure rounding noise, direction is
    # meaningless there)
    gnorm = float(np.sqrt(sum(float(np.sum(a.astype(np.float64) ** 2))
                              for a in base_leaves)))
    for name in ("full", "save_warps"):
        loss, grads = results[name]
        np.testing.assert_allclose(loss, base_loss, rtol=1e-6, err_msg=name)
        for a, b in zip(base_leaves, jax.tree_util.tree_leaves(grads)):
            num = float(np.linalg.norm((a - b).ravel()))
            den = float(np.linalg.norm(a.ravel()))
            assert num <= 1e-4 * den + 1e-7 * gnorm, (
                f"{name}: grad leaf diverged: |da|={num:.3e} |a|={den:.3e} "
                f"|g|={gnorm:.3e}")


def test_frozen_bf16_equivalence():
    """--frozen_bf16 (bf16-stored frozen encoder leaves) must be
    BIT-identical under bf16 compute: flax casts f32 params to the
    module dtype at use, so storage dtype cannot change any operand.
    Loss and a sampled gradient must match exactly."""
    from ppeadepth_tpu.train.step import (cast_frozen_storage, make_loss_fn,
                                          resolve_frozen_bf16)

    opt = TINY.replace(compute_dtype="bfloat16", frozen_bf16="off")
    assert not resolve_frozen_bf16(opt)
    model, state, _, batch = init_model_state(opt, 2)
    opt_on = opt.replace(frozen_bf16="on")
    frozen_bf16 = cast_frozen_storage(state.frozen, opt_on)
    # encoder leaves cast, pose leaves (f32 compute) untouched
    assert any(v.dtype == jnp.bfloat16 for v in frozen_bf16.values())
    assert all(v.dtype != jnp.bfloat16 for k, v in frozen_bf16.items()
               if k[0] not in ("encoder", "mono_encoder"))

    loss_fn = make_loss_fn(model, opt)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn, argnums=0, has_aux=True))
    rng = jax.random.PRNGKey(7)
    outs = {}
    for tag, frozen in (("f32", state.frozen), ("bf16", frozen_bf16)):
        (loss, _), grads = grad_fn(
            state.trainable, frozen, state.batch_stats, batch,
            state.min_depth_bin, state.max_depth_bin, rng)
        outs[tag] = (float(loss), jax.tree_util.tree_map(np.asarray, grads))
    assert np.isfinite(outs["f32"][0])
    assert outs["f32"][0] == outs["bf16"][0], (
        f"loss changed: {outs['f32'][0]} vs {outs['bf16'][0]}")
    for a, b in zip(jax.tree_util.tree_leaves(outs["f32"][1]),
                    jax.tree_util.tree_leaves(outs["bf16"][1])):
        np.testing.assert_array_equal(a, b)


def test_frozen_bf16_checkpoint_saves_f32(tmp_path):
    """With --frozen_bf16 the live frozen leaves are bf16, but a saved
    checkpoint must carry the pristine f32 values (save overlay) and a
    reload against an f32 template must round-trip them exactly."""
    from ppeadepth_tpu.ckpt import io as ckpt_io
    from ppeadepth_tpu.train import freeze as F
    from ppeadepth_tpu.train.step import cast_frozen_storage

    opt = TINY.replace(compute_dtype="bfloat16", frozen_bf16="on")
    model, state, _, _ = init_model_state(
        TINY.replace(compute_dtype="bfloat16", frozen_bf16="off"), 2)
    frozen_f32 = {k: np.asarray(v) for k, v in state.frozen.items()}
    state = state.replace(frozen=cast_frozen_storage(state.frozen, opt))
    assert any(v.dtype == jnp.bfloat16 for v in state.frozen.values())

    folder = str(tmp_path / "ck")
    ckpt_io.save_checkpoint(folder, state, opt, frozen_f32=frozen_f32)

    template = F.merge(state.trainable, frozen_f32)  # f32 template
    import flax.traverse_util as TU
    params = ckpt_io.load_model(folder, template, state.batch_stats)[0]
    flat = TU.flatten_dict(params)
    for k, v in frozen_f32.items():
        assert flat[k].dtype == np.float32, k
        np.testing.assert_array_equal(np.asarray(flat[k]), v)


def test_grad_accum_equivalence():
    """--grad_accum N must equal the manual sequential reference: run
    loss_fn on each N-strided microbatch (BN stats threaded through),
    average grads / metrics / bin stats, apply one optimizer update."""
    from ppeadepth_tpu.train.step import make_loss_fn

    import optax

    opt = TINY.replace(no_matching_augmentation=True)
    model, state, _, batch = init_model_state(opt, 4)
    batch = make_batch(opt, 4)
    rng = jax.random.PRNGKey(11)
    # SGD, not Adam: on step 1 Adam's update is lr*sign(g) per element,
    # so any reassociation-flipped near-zero grad gives a full 2*lr
    # param diff (ill-conditioned as an equivalence metric). With SGD
    # the param delta IS the mean gradient — well-conditioned.
    tx = optax.sgd(1e-2)
    state = state.replace(opt_state=tx.init(state.trainable))

    # accumulated step (batch stacked at the jit boundary, as the
    # Trainer does — see step.stack_microbatches)
    from ppeadepth_tpu.train.step import stack_microbatches

    step2 = make_train_step(model, opt.replace(grad_accum=2), tx,
                            donate=False)
    new_state, metrics = step2(state, stack_microbatches(batch, 2), rng)

    # manual reference: microbatch i = N-strided samples (see step.py)
    loss_fn = make_loss_fn(model, opt)
    grad_fn = jax.value_and_grad(loss_fn, argnums=0, has_aux=True)
    rngs = jax.random.split(rng, 2)
    stats = state.batch_stats
    gsum = None
    dmins, dmaxs, losses = [], [], []
    for i in range(2):
        mb = {k: v[i::2] if v.shape[0] == 4 else v for k, v in batch.items()}
        (loss, (stats, m, mono_depth)), grads = grad_fn(
            state.trainable, state.frozen, stats, mb,
            state.min_depth_bin, state.max_depth_bin, rngs[i])
        losses.append(float(loss))
        d = np.asarray(mono_depth)
        dmins.append(float(np.mean(np.min(d, axis=(1, 2, 3)))))
        dmaxs.append(float(np.mean(np.max(d, axis=(1, 2, 3)))))
        gsum = grads if gsum is None else jax.tree_util.tree_map(
            jnp.add, gsum, grads)
    grads = jax.tree_util.tree_map(lambda g: g / 2, gsum)
    updates, _ = tx.update(grads, state.opt_state, state.trainable)
    ref_trainable = optax.apply_updates(state.trainable, updates)

    # scan compiles one body; fusion differences reassociate f32
    # reductions (~1e-5 rel observed) — far below any wrong-split error
    np.testing.assert_allclose(
        float(metrics["loss"]), np.mean(losses), rtol=1e-4)
    # bin EMA from averaged per-microbatch stats
    dmin = max(opt.min_depth, np.mean(dmins) * 0.9)
    ref_min = float(state.min_depth_bin) * 0.99 + dmin * 0.01
    np.testing.assert_allclose(float(new_state.min_depth_bin), ref_min,
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(ref_trainable),
                    jax.tree_util.tree_leaves(new_state.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
    # BN stats threaded sequentially. Tolerances bound reassociation
    # noise in the per-microbatch batch means (observed ~1e-6 abs);
    # a wrong update order/sequencing moves stats by O(1e-2).
    for a, b in zip(jax.tree_util.tree_leaves(stats),
                    jax.tree_util.tree_leaves(new_state.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-6)


def test_grad_accum_dp_equivalence():
    """grad_accum under an 8-device dp mesh == single-device grad_accum
    (pins the stacked-batch sharding through the scan and the per-shard
    pallas dispatch inside the microbatch body)."""
    from ppeadepth_tpu.train.step import stack_microbatches

    assert len(jax.devices()) >= 8
    opt = TINY.replace(no_matching_augmentation=True, grad_accum=2)
    model, state, tx, _ = init_model_state(opt, 8)
    batch = make_batch(opt, 8)
    step_fn = make_train_step(model, opt, tx, donate=False)
    rng = jax.random.PRNGKey(7)
    stacked = jax.jit(lambda b: stack_microbatches(b, 2))(batch)

    _, m_single = step_fn(state, stacked, rng)

    mesh = M.make_mesh(8)
    state_r = M.replicate(state, mesh)
    batch_s = M.shard_batch(batch, mesh)
    stacked_s = jax.jit(lambda b: stack_microbatches(b, 2))(batch_s)
    _, m_dp = step_fn(state_r, stacked_s, rng)

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_dp["loss"]), rtol=2e-4)
    np.testing.assert_allclose(
        float(m_single["depth_bins/max"]), float(m_dp["depth_bins/max"]),
        rtol=1e-5)
