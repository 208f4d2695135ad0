"""The jitted training step: forward, photometric losses, grads over the
trainable partition, optimizer update, depth-bin EMA — one XLA program.

Loss semantics mirror Trainer.process_batch / generate_images_pred /
compute_losses (trainer.py:420-472, 871-926, 1032-1160):
  - teacher (mono) branch: min-reprojection over frames ±1, automask vs
    min identity reprojection (+ randn*1e-5 tie-break), edge-aware
    smoothness on mean-normalised disparity;
  - student (multi) branch: pose detached, reprojection masked by
    consistency_mask x (1 - augmentation_mask), consistency loss
    |multi_depth - sg(mono_depth)| on the masked-out pixels;
  - teacher losses added to the total when the teacher is not frozen;
  - adaptive depth-bin EMA (DepthBins, trainer.py:41-69): per-sample
    min/max of full-res teacher depth -> batch mean -> widened x0.9/x1.1
    -> EMA 0.99. Under a dp-sharded batch the batch-mean is global, which
    subsumes the reference's cross-rank min/max reduce.

Data parallelism: no explicit collectives appear here. The step is jitted
over a `Mesh`; the batch arrives sharded on the 'dp' axis and params/state
replicated, and XLA inserts the gradient all-reduce (the NCCL allreduce of
trainer.py:350) automatically.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.ad_checkpoint import checkpoint_name

from ..core import losses as L
from ..core.geometry import disp_to_depth, reproject_coords
from ..kernels import warp_mxu
from ..options import Config
from ..parallel import mesh as mesh_lib
from ..ops.resize import resize_bilinear
from ..ops.sampling import grid_sample
from . import freeze


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    trainable: Dict
    frozen: Dict
    batch_stats: Dict
    opt_state: Any
    min_depth_bin: jnp.ndarray
    max_depth_bin: jnp.ndarray

    @property
    def params(self):
        return freeze.merge(self.trainable, self.frozen)


# frozen-partition bf16 storage (--frozen_bf16): only leaves consumed by
# modules that compute in compute_dtype. The two RepLKNet encoders hold
# ~all the frozen memory and every submodule takes dtype=compute; pose
# nets compute in f32 (pinned precision, models/pose.py) and the
# decoders are only frozen in dc mode and are small — both excluded.
_BF16_STORE_TOPS = ("encoder", "mono_encoder")


def resolve_frozen_bf16(opt: Config) -> bool:
    return opt.frozen_bf16 == "on" or (
        opt.frozen_bf16 == "auto" and opt.compute_dtype == "bfloat16")


def cast_frozen_storage(frozen: Dict, opt: Config) -> Dict:
    """bf16-store the frozen encoder leaves (flat path-tuple dict).

    Bit-identical compute: flax modules cast params to `dtype` at use,
    so a bf16-stored leaf and an f32 leaf cast at compute produce the
    same operand. Saves ~2 bytes/param of persistent HBM (~300 MB at
    rep_size=b stage 1). Checkpoints save f32 — the Trainer overlays a
    pristine host copy (ckpt/io.save_checkpoint frozen_f32)."""
    if not resolve_frozen_bf16(opt):
        return frozen
    return {
        k: (v.astype(jnp.bfloat16)
            if k[0] in _BF16_STORE_TOPS and v.dtype == jnp.float32 else v)
        for k, v in frozen.items()
    }


def create_train_state(model, variables, opt: Config, tx) -> TrainState:
    labels = freeze.param_labels(variables["params"], opt)
    trainable, frozen = freeze.partition(variables["params"], labels)
    frozen = cast_frozen_storage(frozen, opt)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        trainable=trainable,
        frozen=frozen,
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(trainable),
        # DepthBins defaults (trainer.py:45-46)
        min_depth_bin=jnp.asarray(0.1, jnp.float32),
        max_depth_bin=jnp.asarray(10.0, jnp.float32),
    )


def _warp_frames(inputs, depth, poses, opt: Config, is_multi: bool):
    """Inverse-warp neighbor frames into frame 0 (trainer.py:894-914).

    Backend 'mxu' replaces the bilinear corner gathers (and their
    coordinate-gradient re-gathers — 16 x ~10 ms custom fusions, ~27%
    of the step at KITTI shapes) with the gather-free indicator-matmul
    pallas kernel (kernels/warp_mxu.py; exact pixel selection, image
    operand in bf16). 'mxu_exact' is the bit-exact f32 mode; 'lax' is
    the XLA gather path (exact oracle).
    """
    backend = warp_mxu.resolve_warp_backend(opt.warp_backend)
    # explicit --warp_backend mxu/mxu_exact on a non-TPU backend runs the
    # pallas kernel in interpret mode (mirrors the cv_backend path) so CPU
    # tests/debug of the kernel semantics work without a chip
    interp = jax.default_backend() != "tpu"
    K = inputs[("K", 0)]
    invK = inputs[("inv_K", 0)]
    frames = list(opt.frame_ids[1:])
    coords = {}
    for f in frames:
        T = poses[("cam_T_cam", 0, f)]
        if is_multi:
            T = jax.lax.stop_gradient(T)  # trainer.py:899-901
        coords[f] = reproject_coords(depth, invK, K, T)
    if backend == "lax":
        return {f: grid_sample(inputs[("color", f, 0)], coords[f],
                               "border")
                for f in frames}
    # ONE kernel dispatch for the branch's warps: the per-frame colors
    # and coordinate grids stack on the batch axis, so the pallas call
    # runs F*B samples instead of F x B (halves the per-call fixed cost
    # of the custom-call + its vjp pair; round 5). The stack/split
    # happens INSIDE the shard-mapped function: per-shard, each device
    # concatenates its own local frames — stacking outside would make
    # GSPMD reshard the frame-concatenated batch axis (all-to-all).
    if backend == "mxu_exact":
        fn = lambda i, c: warp_mxu.grid_sample_border_mxu(
            i, c, interp, "highest", "float32")  # noqa: E731
    else:  # 'mxu': exact pixel selection, bf16 image operand
        fn = lambda i, c: warp_mxu.grid_sample_border_mxu(
            i, c, interp)  # noqa: E731
    nf = len(frames)

    def batched(colors, grids):
        out = fn(jnp.concatenate(colors, axis=0),
                 jnp.concatenate(grids, axis=0))
        n = colors[0].shape[0]
        return tuple(out[i * n:(i + 1) * n] for i in range(nf))

    sampler = mesh_lib.shard_batch_call(
        batched, in_specs=(True, True), out_specs=(True,) * nf)
    warped_all = sampler(
        tuple(inputs[("color", f, 0)] for f in frames),
        tuple(coords[f] for f in frames))
    return dict(zip(frames, warped_all))


def _branch_losses(inputs, outputs, opt: Config, noise_rng, is_multi: bool):
    """Scale-0 losses for one branch. Returns (loss, aux, depth)."""
    disp = outputs[("disp", 0)]
    disp_full = resize_bilinear(disp, opt.height, opt.width)
    _, depth = disp_to_depth(disp_full, opt.min_depth, opt.max_depth)

    warped = _warp_frames(inputs, depth, outputs, opt, is_multi)
    # no-op unless under jax.checkpoint with the save_warps policy
    # (--remat_policy): lets the bwd recompute start FROM the warps
    # instead of re-running the pallas warp kernels + geometry chain.
    # Saved NHWC residuals take a padded batch-minor layout (~88 MB each
    # at bs 12 — does not fit a 16 GB part at per-device bs >= 12, use
    # 'full' there). Naming a flat [B,H,W*C] view stores them unpadded
    # but was measured SLOWER than full remat (the reshape at the
    # checkpoint boundary unfuses the SSIM reduce-windows: 300 vs 265
    # ms at bs 8) — keep the plain name. BENCHMARKS.md round 3.
    warped = {f: checkpoint_name(w, "warp") for f, w in warped.items()}
    target = inputs[("color", 0, 0)]

    reproj = jnp.concatenate(
        [L.reprojection_loss(warped[f], target, opt.no_ssim)
         for f in opt.frame_ids[1:]],
        axis=-1,
    )  # [B, H, W, F]
    reproj_min = jnp.min(reproj, axis=-1, keepdims=True)

    if opt.selec_reproj:
        # warp-hole selection (trainer.py:1077-1083): where a warped frame
        # is all-black use the other frame's loss; both black -> 0.
        # frame order is frame_ids[1:] == (-1, +1)
        m_m1 = (
            jnp.sum(warped[opt.frame_ids[1]], -1, keepdims=True) < 0.1
        )
        m_p1 = (
            jnp.sum(warped[opt.frame_ids[2]], -1, keepdims=True) < 0.1
        )
        m_m1 = jax.lax.stop_gradient(m_m1)
        m_p1 = jax.lax.stop_gradient(m_p1)
        reproj_min = jnp.where(m_m1, reproj[..., 1:2], reproj_min)
        reproj_min = jnp.where(m_p1, reproj[..., 0:1], reproj_min)
        reproj_min = jnp.where(m_m1 & m_p1, 0.0, reproj_min)

    if not opt.disable_automasking and not is_multi:
        # the multi branch replaces the automask wholesale
        # (trainer.py:1101-1104), so identity reprojection is only
        # computed for the teacher branch
        identity = jnp.concatenate(
            [L.reprojection_loss(inputs[("color", f, 0)], target, opt.no_ssim)
             for f in opt.frame_ids[1:]],
            axis=-1,
        )
        identity_min = jnp.min(identity, axis=-1, keepdims=True)
        identity_min = identity_min + (
            jax.random.normal(noise_rng, identity_min.shape) * 1e-5
        )  # tie-break noise, trainer.py:1084-1087
        mask = L.automask(reproj_min, identity_min)
    else:
        mask = jnp.ones_like(reproj_min)

    aux = {}
    if is_multi:
        # trainer.py:1101-1121
        mask = jnp.ones_like(mask)
        if not opt.disable_motion_masking:
            mask = mask * outputs["consistency_mask"][..., None]
        if not opt.no_matching_augmentation:
            mask = mask * (1.0 - outputs["augmentation_mask"])
        consistency_sel = 1.0 - mask
        mono_depth = jax.lax.stop_gradient(outputs[("mono_depth", 0, 0)])
        consistency_loss = jnp.mean(
            jnp.abs(depth - mono_depth) * consistency_sel
        )
        aux["consistency_loss"] = consistency_loss
    else:
        consistency_loss = 0.0

    reproj_loss = jnp.sum(reproj_min * mask) / (jnp.sum(mask) + 1e-7)

    smooth = L.normalized_smooth_loss(disp, inputs[("color", 0, 0)])
    loss = (
        reproj_loss + consistency_loss
        + opt.disparity_smoothness * smooth
    )
    aux["reproj_loss"] = reproj_loss
    aux["smooth_loss"] = smooth
    return loss, aux, depth


def make_loss_fn(model, opt: Config):
    """Build the train objective: full forward (both branches) + losses.

    Returns loss_fn(trainable, frozen, batch_stats, batch, min_bin,
    max_bin, rng) -> (total, (new_batch_stats, metrics, mono_depth)).
    Split out of make_train_step so the reference gradient-parity test
    (tests/test_ref_loss_grad.py) can jax.grad it directly against torch
    autograd on the reference's model + compute_losses.
    """
    freeze_tp = opt.freeze_teacher_and_pose

    # Remat the scale-0 loss section: its full-res intermediates (4 warps,
    # 6 SSIM pyramids, masks) dominate live HBM but cost little to
    # recompute in the backward pass. The BARE step fits bs 12 on a 16 GB
    # v5e without it; the full Trainer (prefetched next batch + sharded
    # buffer assignment) does not — Trainer auto-enables it there.
    # (outputs mixes tuple and str keys, which pytree dict-key sorting
    # under jax.checkpoint rejects — split and re-merge at the boundary)
    def _branch_split(inputs, outs_t, outs_s, noise_rng, is_multi):
        return _branch_losses(inputs, {**outs_t, **outs_s}, opt,
                              noise_rng, is_multi)

    if opt.remat_loss:
        if opt.remat_policy == "save_warps":
            _branch_split = jax.checkpoint(
                _branch_split, static_argnums=(4,),
                policy=jax.checkpoint_policies.save_only_these_names("warp"))
        else:
            _branch_split = jax.checkpoint(_branch_split, static_argnums=(4,))

    def _branch(inputs, outputs, noise_rng, is_multi):
        outs_t = {k: v for k, v in outputs.items() if isinstance(k, tuple)}
        outs_s = {k: v for k, v in outputs.items() if not isinstance(k, tuple)}
        return _branch_split(inputs, outs_t, outs_s, noise_rng, is_multi)

    def loss_fn(trainable, frozen, batch_stats, batch, min_bin, max_bin, rng):
        params = freeze.merge(trainable, frozen)
        rng_dp, rng_aug, rng_n1, rng_n2 = jax.random.split(rng, 4)
        (mono_outputs, outputs), mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch,
            min_bin,
            max_bin,
            True,  # train
            freeze_tp,
            opt.freeze_pose,
            rngs={"droppath": rng_dp, "aug": rng_aug},
            mutable=["batch_stats"],
        )

        # teacher branch
        mono_loss, mono_aux, mono_depth = _branch(
            batch, mono_outputs, rng_n1, False
        )
        # expose teacher depth to the student branch (trainer.py:443-448)
        outputs[("mono_depth", 0, 0)] = mono_depth

        # distrust cost-volume where it disagrees with the teacher
        # (trainer.py:450-451, 859-869)
        outputs["consistency_mask"] = (
            outputs["consistency_mask"]
            * L.matching_mask(
                jax.lax.stop_gradient(mono_depth), outputs["lowest_cost"]
            )[..., 0]
        )

        multi_loss, multi_aux, _ = _branch(
            batch, outputs, rng_n2, True
        )

        total = multi_loss
        if not freeze_tp:
            total = total + mono_loss  # trainer.py:459-461

        metrics = {
            "loss": total,
            "mono/loss": mono_loss,
            "mono/reproj": mono_aux["reproj_loss"],
            "multi/loss": multi_loss,
            "multi/reproj": multi_aux["reproj_loss"],
            "multi/consistency": multi_aux["consistency_loss"],
        }
        return total, (mutated["batch_stats"], metrics, mono_depth)

    return loss_fn


def stack_microbatches(batch, n: int):
    """[B, ...] -> [n, B//n, ...] for --grad_accum: microbatch i takes
    the n-strided samples i::n, so under a dp-sharded batch every device
    contributes local_batch/n samples to every microbatch (a contiguous
    split would gather samples from a device subset each scan step).

    Call this under its OWN jit (the Trainer does) so the stacked batch
    crosses the train-step boundary as a compact argument buffer; the
    transposed copies it makes are transient temps of the small stacking
    program instead of living inside the step's peak."""
    def _s(x):
        B = x.shape[0]
        return jnp.moveaxis(x.reshape((B // n, n) + x.shape[1:]), 1, 0)

    return jax.tree_util.tree_map(_s, batch)


def make_train_step(model, opt: Config, tx, donate: bool = True,
                    donate_batch: bool = False):
    """Build the jitted train step closure.

    donate_batch additionally donates the batch buffers (~100 MB of
    full-res frames at bs 12) for reuse as temps during the step — only
    safe when every call gets a FRESH batch (the trainer's loader loop;
    profile tools and overfit tests re-feed the same batch and must not
    set it, or the second call hits deleted buffers).

    (Fusing the fast pipeline's device-side augment into this step was
    measured and rejected: the [B,H,W,3] color tensors become padded
    in-program temps and the bs-12 no-remat step grows +0.4 GB past a
    16 GB v5e; as jit-boundary buffers they stay compact. BENCHMARKS.md
    round 3.)
    """
    freeze_tp = opt.freeze_teacher_and_pose
    update_bins = (not freeze_tp) and (not opt.notadabins)
    loss_fn = make_loss_fn(model, opt)

    def _one_microbatch(trainable, frozen, stats, b, min_bin, max_bin, r):
        grad_fn = jax.value_and_grad(loss_fn, argnums=0, has_aux=True)
        (_, (new_stats, metrics, mono_depth)), grads = grad_fn(
            trainable, frozen, stats, b, min_bin, max_bin, r,
        )
        d = jax.lax.stop_gradient(mono_depth)
        dmin = jnp.mean(jnp.min(d, axis=(1, 2, 3)))
        dmax = jnp.mean(jnp.max(d, axis=(1, 2, 3)))
        return grads, new_stats, metrics, dmin, dmax

    def train_step(state: TrainState, batch, rng):
        if opt.grad_accum > 1:
            # --grad_accum N: scan N pre-stacked microbatches, averaging
            # grads / metrics / bin statistics; BN running stats update
            # sequentially per microbatch (torch grad-accum semantics:
            # each forward updates running stats). The batch MUST be
            # stacked by stack_microbatches in ITS OWN jit before the
            # step: stacking in here materializes padded transposed
            # copies of every color tensor as in-program temps
            # (measured +2.3 GB at bs 24 — same failure mode as fusing
            # the augment into the step), while a jit-boundary stacked
            # batch stays compact. The one compiled scan body keeps
            # compile time flat in N.
            N = opt.grad_accum
            mbs = batch
            lead = {x.shape[0] for x in jax.tree_util.tree_leaves(batch)}
            if lead != {N}:
                raise ValueError(
                    f"grad_accum={N}: pass the batch through "
                    f"stack_microbatches first (leading dims {lead})")
            rngs = jax.random.split(rng, N)

            def body(carry, xs):
                stats, gsum = carry
                b, r = xs
                grads, stats, metrics, dmin, dmax = _one_microbatch(
                    state.trainable, state.frozen, stats, b,
                    state.min_depth_bin, state.max_depth_bin, r)
                gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
                return (stats, gsum), (metrics, dmin, dmax)

            (new_stats, gsum), (m_st, dmin_st, dmax_st) = jax.lax.scan(
                body,
                (state.batch_stats,
                 jax.tree_util.tree_map(jnp.zeros_like, state.trainable)),
                (mbs, rngs),
            )
            grads = jax.tree_util.tree_map(lambda g: g / N, gsum)
            metrics = jax.tree_util.tree_map(lambda v: jnp.mean(v, 0), m_st)
            dmin, dmax = jnp.mean(dmin_st), jnp.mean(dmax_st)
        else:
            grads, new_stats, metrics, dmin, dmax = _one_microbatch(
                state.trainable, state.frozen, state.batch_stats, batch,
                state.min_depth_bin, state.max_depth_bin, rng,
            )
        updates, new_opt_state = tx.update(
            grads, state.opt_state, state.trainable
        )
        new_trainable = optax.apply_updates(state.trainable, updates)

        if update_bins:
            dmin = jnp.maximum(opt.min_depth, dmin * 0.9)
            dmax = dmax * 1.1
            new_min = state.min_depth_bin * 0.99 + dmin * 0.01
            new_max = state.max_depth_bin * 0.99 + dmax * 0.01
        else:
            new_min, new_max = state.min_depth_bin, state.max_depth_bin

        new_state = state.replace(
            step=state.step + 1,
            trainable=new_trainable,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            min_depth_bin=new_min,
            max_depth_bin=new_max,
        )
        metrics["depth_bins/min"] = new_min
        metrics["depth_bins/max"] = new_max
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    if donate and donate_batch:
        donate_argnums = (0, 1)
    return jax.jit(train_step, donate_argnums=donate_argnums)
