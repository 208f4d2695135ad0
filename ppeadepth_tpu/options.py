"""Typed configuration + CLI with the reference's public flag names.

The reference threads a ~150-flag argparse.Namespace everywhere
(options.py:13-479); most flags are dead experiment leftovers (the
segmentation stack options.py:250-331 is never referenced by the trainer).
Here the *live* surface — the flags exercised by the README commands and
the shipped ckpt/models/opt.json — becomes a frozen dataclass (hashable,
so it can be a static field of flax modules), and `parse_args` exposes the
same CLI names so `python -m ppeadepth_tpu.train` accepts the reference's
command lines.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple


@dataclass(frozen=True)
class Config:
    # paths / data
    data_path: str = ""
    log_dir: str = "./ckpt"
    split: str = "eigen_zhou"
    dataset: str = "kitti"
    png: bool = False
    height: int = 192
    width: int = 640
    cs_eval_path: str = "../cityscapes"

    # depth range & frames
    min_depth: float = 0.1
    max_depth: float = 100.0
    frame_ids: Tuple[int, ...] = (0, -1, 1)
    use_future_frame: bool = False
    num_matching_frames: int = 1
    sclm: int = 0  # highest disparity scale used in the loss (live: 0)

    # optimisation
    batch_size: int = 12
    learning_rate: float = 1e-4
    num_epochs: int = 20
    scheduler_step_size: int = 15
    num_workers: int = 12
    pytorch_random_seed: Optional[int] = None

    # loss switches
    disparity_smoothness: float = 1e-3
    no_ssim: bool = False
    disable_automasking: bool = False
    disable_motion_masking: bool = False
    no_matching_augmentation: bool = False
    selec_reproj: bool = False

    # cost volume
    depth_binning: str = "log"
    num_depth_bins: int = 96
    notadabins: bool = False
    cv_min: bool = False
    cv_set_1: bool = False
    cv_pool: bool = False
    dyn_cv: bool = False  # wire match_features_dyn (unwired in reference)
    cv_pool_radius: int = 1
    cv_pool_th: float = 0.7

    # architecture
    adapter: bool = False
    rep_size: str = "b"
    use_checkpoint: bool = False
    adpt_test: int = 4
    ratio: float = 0.25
    g_blk: float = 1.0
    g_ffn: float = 1.0
    trans: bool = False
    input: bool = False
    mono_trans: bool = False
    mono_input: bool = False
    pose_cnn: bool = False
    # "pretrained" (default, like the reference options.py:142-146) makes
    # the Trainer load ImageNet RepLKNet weights into both backbones and
    # a resnet18 state_dict into the pose encoder at init
    # (ckpt/torch_import.bootstrap_pretrained); files missing is an error.
    # "scratch" starts from random init.
    weights_init: str = "pretrained"
    # directory holding RepLKNet-31{B,L}…pth / resnet18*.pth — the
    # reference hardcodes ./pretrained (repdepth.py:84-88)
    backbone_weights: str = "./pretrained"
    num_layers: int = 18

    # stage 2 (dynamic-scene fine-tuning)
    dc: bool = False
    dec_id: int = 1
    dec_ratio: float = 0.25
    train_cs: bool = False
    dec_only: bool = False
    fullft_reb: bool = False
    lps2: bool = False
    ktf: bool = False

    # freezing
    freeze_teacher_and_pose: bool = False
    # accepted for CLI compatibility but REJECTED if changed: the
    # schedule-triggered freeze is commented out in the reference
    # (trainer.py:410-414) and never ran; silently accepting these would
    # let users believe a freeze schedule is in effect
    freeze_teacher_epoch: int = 150
    freeze_teacher_step: int = -1
    freeze_pose: bool = False

    # eval
    eval: bool = False
    eval_split: str = "eigen"
    eval_teacher: bool = False
    zero_cost_volume: bool = False
    static_camera: bool = False
    disable_median_scaling: bool = False
    post_process: bool = False  # Monodepth-v1 flip TTA at eval
    # DDAD eval runs at the reference's forced 320x480
    # (evaluate_ddad.py:251-255) unless this keeps the training resolution
    eval_native_res: bool = False
    pred_depth_scale_factor: float = 1.0
    load_weights_folder: Optional[str] = None
    ddad: bool = False
    # legacy eval (eval_depth_ori equivalent)
    save_pred_disps: bool = False
    no_eval: bool = False
    ext_disp_to_eval: Optional[str] = None

    # logging / checkpoints
    name: str = "test"
    model_name: str = "mdp"
    tags: str = "multi"
    validate_every: int = 3000
    debug: bool = False

    # tpu-native extras (not in the reference)
    compute_dtype: str = "float32"  # set "bfloat16" for bf16 compute / f32 params
    # stochastic-depth rate for both RepLKNet encoders; the reference
    # hardcodes 0.3 (repdepth.py:95,106). Exposed so deterministic
    # cross-implementation gradient tests can zero it.
    drop_path_rate: float = 0.3
    lk_backend: str = "lax"          # 'lax' | 'pallas'
    bin_chunk: int = 8  # cost-volume bins per gather chunk (VMEM/HBM bound)
    cv_backend: str = "auto"  # plane-sweep: auto | lax | mxu | mxu_f32
    warp_backend: str = "auto"  # photometric warp: auto | lax | mxu | mxu_exact
    # fused ConvFFN deploy kernel (kernels/ffn_mxu.py): 'auto' enables it
    # only for merged-form bf16 inference on TPU (bench/serve path).
    # Also accepts a per-encoder-stage comma list ("lax,mxu,mxu,mxu") —
    # the XL layout-poisoning workaround (kernels/ffn_mxu.py).
    ffn_backend: str = "auto"
    # banded MXU large-kernel conv for merged deploy inference
    # (kernels/banded_conv.py): 'auto' enables it for stages 0-1 on TPU
    # bf16 (measured faster); also accepts a 4-stage comma list.
    lk_deploy_backend: str = "auto"
    # differentiable banded conv for the TRAINING large-kernel convs
    # (stages 0-1; tables rebuilt in-step so no persistent HBM, d/dx is
    # the flipped-table banded conv, d/dw stays exact for unfrozen
    # runs). 'auto' = banded on TPU bf16: measured 476 -> 440 ms/step
    # at bs 12 (+8.2% imgs/s; stage0 fwd+bwd 2.24x, stage1 3.03x;
    # loss 0.8581 vs 0.8585 — BENCHMARKS.md). Also accepts a 4-stage
    # comma list like ffn_backend / lk_deploy_backend.
    lk_train_backend: str = "auto"
    # memory escape hatch: recompute scale-0 loss intermediates in bwd.
    # The BARE profiled step fits bs 12 on 16 GB without it, but the full
    # Trainer does not (device-prefetched next batch + sharded-step buffer
    # assignment eat the last ~200 MB; still OOMs at bs 11) — the Trainer
    # auto-enables it at per-device batch >= 11 with --use_checkpoint off
    # (BENCHMARKS.md). Cost: 91 ms in the bare step; ~0 under the
    # SPMD-partitioned compile.
    remat_loss: bool = False
    # --remat_loss granularity: 'full' recomputes the whole scale-0 loss
    # section in the bwd; 'save_warps' additionally saves the 4 full-res
    # pallas warp outputs so the bwd recompute skips re-running the warp
    # kernels + reprojection geometry chain. Measured (BENCHMARKS.md):
    # 3.3% faster at bs 8 (256.7 vs 265.5 ms sharded), but the padded
    # warp residuals (+351 MB) OOM the 16 GB part at per-device bs 12 —
    # use at per-device bs <= 8, or on larger-HBM parts (v6e/v5p).
    remat_policy: str = "full"
    # store the FROZEN RepLKNet-encoder partition in bf16 on device
    # during training. Those leaves are only ever consumed by modules
    # computing in compute_dtype (flax casts params to `dtype` at use),
    # so with bf16 compute the f32 copies are pure HBM waste (~300 MB of
    # frozen backbone at rep_size=b) — bit-identical loss/grads, tested.
    # 'auto' = on iff compute_dtype == bfloat16. Pose nets / f32-pinned
    # modules are excluded (train/step.cast_frozen_storage). Checkpoints
    # still save f32: the Trainer keeps a pristine host-side copy.
    frozen_bf16: str = "auto"        # auto | on | off
    # rematerialize the pose nets in the backward pass: their saved
    # residuals are ~960 MB at bs 12 (layout-padded f32 buffers) vs a
    # ~2 ms ResNet-18 recompute; bit-identical gradients. See
    # models/repdepth.RepDepth._pose_pair.
    remat_pose: bool = True
    # gradient accumulation (beyond the reference): split each step's
    # batch into N scanned microbatches, average grads/metrics/bin
    # statistics, update once. Activation memory scales with
    # batch_size/N, so effective batches far beyond the 16 GB bs-12
    # ceiling fit one chip. BN running stats update per microbatch
    # (torch grad-accum semantics). batch_size must divide by N (and by
    # N*n_devices when dp-sharded).
    grad_accum: int = 1
    fast_pipeline: bool = False      # native decode + device-side augment
    # decoded-raw epoch cache directory (with --fast_pipeline): decode
    # each training image once, read repeats from a memory-mapped u8
    # array (data/decode_cache.py). Empty = off.
    decode_cache: str = ""
    merged: bool = False             # deploy: reparam-merged LK convs

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def with_mode_presets(self) -> "Config":
        """Runtime mode presets (trainer.py:90-103).

        Deviation from the reference: the reference unconditionally
        forces 192x512 (cs) / 384x640 (ddad); here an EXPLICIT
        --height/--width survives the preset (needed for reduced-size
        tests; the reference's resolutions remain the defaults).
        """
        cfg = self
        default_hw = (Config.height, Config.width)
        if cfg.train_cs:
            cfg = cfg.replace(
                dataset="cityscapes_preprocessed",
                split="cityscapes_preprocessed", eval_split="cityscapes",
            )
            if (cfg.height, cfg.width) == default_hw:
                cfg = cfg.replace(height=192, width=512)
        if cfg.ddad:
            cfg = cfg.replace(
                dataset="ddad", split="ddad", eval_split="ddad",
            )
            if (cfg.height, cfg.width) == default_hw:
                cfg = cfg.replace(height=384, width=640)
        assert cfg.height % 32 == 0, "'height' must be a multiple of 32"
        assert cfg.width % 32 == 0, "'width' must be a multiple of 32"
        assert cfg.cv_backend in ("auto", "lax", "mxu", "mxu_f32"), (
            f"unknown --cv_backend {cfg.cv_backend!r}")
        assert cfg.warp_backend in ("auto", "lax", "mxu", "mxu_exact"), (
            f"unknown --warp_backend {cfg.warp_backend!r}")
        ffn_parts = cfg.ffn_backend.split(",")
        assert len(ffn_parts) in (1, 4) and all(
            p in ("auto", "lax", "mxu") for p in ffn_parts), (
            f"unknown --ffn_backend {cfg.ffn_backend!r} "
            "(one of auto|lax|mxu, or a 4-stage comma list)")
        assert cfg.lk_backend in ("lax", "pallas"), (
            f"unknown --lk_backend {cfg.lk_backend!r}")
        lkd_parts = cfg.lk_deploy_backend.split(",")
        assert len(lkd_parts) in (1, 4) and all(
            p in ("auto", "lax", "banded") for p in lkd_parts), (
            f"unknown --lk_deploy_backend {cfg.lk_deploy_backend!r} "
            "(one of auto|lax|banded, or a 4-stage comma list)")
        lkt_parts = cfg.lk_train_backend.split(",")
        assert len(lkt_parts) in (1, 4) and all(
            p in ("auto", "lax", "banded") for p in lkt_parts), (
            f"unknown --lk_train_backend {cfg.lk_train_backend!r} "
            "(one of auto|lax|banded, or a 4-stage comma list)")
        assert cfg.remat_policy in ("full", "save_warps"), (
            f"unknown --remat_policy {cfg.remat_policy!r}")
        assert cfg.frozen_bf16 in ("auto", "on", "off"), (
            f"unknown --frozen_bf16 {cfg.frozen_bf16!r}")
        assert cfg.weights_init in ("pretrained", "scratch"), (
            f"unknown --weights_init {cfg.weights_init!r} "
            "(choices: pretrained, scratch — reference options.py:142-146)")
        assert cfg.grad_accum >= 1 and cfg.batch_size % cfg.grad_accum == 0, (
            f"--batch_size {cfg.batch_size} must be a positive multiple "
            f"of --grad_accum {cfg.grad_accum}")
        # --dyn_cv composes with any --num_matching_frames since round 5:
        # ops/cost_volume.plane_sweep_cost_volume_dyn in-fills each
        # frame's warped FEATURES before the diff like the reference
        # (replk_matching_adapter.py:187-236), with each frame's own
        # occlusion mask — the reference's F>1 path misindexes its
        # [B*F]-row mask stack with batch_idx < B (:166,:171), see the
        # _occ_masks docstring; oracle-pinned at F=1 in
        # tests/test_dyn_cv_oracle.py.
        if (cfg.freeze_teacher_epoch, cfg.freeze_teacher_step) != (150, -1):
            raise ValueError(
                "--freeze_teacher_epoch/--freeze_teacher_step are dead "
                "flags: the epoch/step-triggered freeze is commented out "
                "in the reference (trainer.py:410-414) and is not "
                "implemented here; use --freeze_teacher_and_pose or "
                "--freeze_pose from the start of the run"
            )
        return cfg

    @property
    def matching_ids(self) -> Tuple[int, ...]:
        ids = [0]
        if self.use_future_frame:
            ids.append(1)
        ids.extend(range(-1, -1 - self.num_matching_frames, -1))
        return tuple(ids)

    @property
    def num_ch_enc(self) -> Tuple[int, ...]:
        from .models.replknet import REPLK_CONFIGS

        return tuple(REPLK_CONFIGS[self.rep_size]["channels"])


def _add_flags(p: argparse.ArgumentParser):
    defaults = Config()
    field_names = {g.name for g in dataclasses.fields(Config)}
    for f in dataclasses.fields(Config):
        name = "--" + f.name
        default = getattr(defaults, f.name)
        if f.type == "bool" or isinstance(default, bool):
            # every bool gets an explicit off switch: default-True flags
            # (e.g. remat_pose) were inexpressible as False from the CLI
            # in rounds 1-3, blocking A/B measurements (VERDICT r3 #4).
            # Exceptions: when no_<name> is itself a reference flag
            # (--no_eval), the primary keeps it and <name> gets no off
            # switch (it is default-False store_true anyway); and fields
            # already named no_* get no --no_no_* double negative.
            g = p.add_mutually_exclusive_group()
            g.add_argument(name, dest=f.name, action="store_true",
                           default=default)
            if ("no_" + f.name not in field_names
                    and not f.name.startswith("no_")):
                g.add_argument("--no_" + f.name, dest=f.name,
                               action="store_false")
        elif f.name == "pytorch_random_seed":
            p.add_argument(name, type=int, default=None)
        elif f.name == "frame_ids":
            p.add_argument(name, nargs="+", type=int, default=list(default))
        elif isinstance(default, int):
            p.add_argument(name, type=int, default=default)
        elif isinstance(default, float):
            p.add_argument(name, type=float, default=default)
        else:
            p.add_argument(name, type=str, default=default)
    return p


def parse_args(argv=None) -> Config:
    p = argparse.ArgumentParser("ppeadepth_tpu")
    _add_flags(p)
    ns = p.parse_args(argv)
    kw = vars(ns)
    kw["frame_ids"] = tuple(kw["frame_ids"])
    return Config(**kw).with_mode_presets()
