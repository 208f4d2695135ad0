"""RepDepth — the full teacher/student composition.

Mirrors ppeadepth/networks/repdepth.py:19-624 with the same submodule
names (they define the checkpoint namespace):

  encoder      — RepLKMatching student encoder with cost volume
  depth        — student DepthDecoderV2
  mono_encoder — RepLKNet teacher encoder
  mono_depth   — teacher DepthDecoderV2
  pose_encoder — ResnetEncoder(18, 2 images)
  pose         — PoseDecoder

Only the ResNet+PoseDecoder pose path is wired: the reference's --pose_cnn
path crashes on an undefined predict_poses_vit (repdepth.py:538,544), so it
is intentionally not reproduced.

Freezing is NOT handled here: in jax, parameter freezing is an optimizer
concern (see train/freeze.py for the name-predicate partition that mirrors
repdepth.py:47-66,121-140 and dc_ft_init's decoder freeze). The module
only decides where gradients are *cut* (stop_gradient), mirroring the
reference's torch.no_grad/detach sites.

BatchNorm note (intentional deviation): the reference runs SyncBN in the
student encoder and local BN in the teacher (replk_matching_adapter.py:68
vs repdepth.py:101). Under a global-view jit over a sharded batch, all BN
batch statistics are global-batch statistics (sync) — strictly more
consistent; documented in SURVEY §2.11.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.geometry import transformation_from_parameters
from ..kernels.ffn_mxu import backend_for_config as _ffn_backend_for
from ..options import Config
from ..ops.resize import resize_nearest
from .depth_decoder import DepthDecoderV2
from .matching_encoder import RepLKMatching
from .pose import PoseDecoder
from .resnet import ResnetEncoder


class RepDepth(nn.Module):
    opt: Config

    def setup(self):
        opt = self.opt
        adpt = opt.adpt_test if opt.adapter else -1
        dtype = jnp.bfloat16 if opt.compute_dtype == "bfloat16" else None
        self.encoder = RepLKMatching(
            rep_size=opt.rep_size,
            use_checkpoint=opt.use_checkpoint,
            adpt_test=adpt,
            g_blk=opt.g_blk,
            g_ffn=opt.g_ffn,
            ratio=opt.ratio,
            trans_adpt=opt.trans,
            input_adpt=opt.input,
            num_depth_bins=opt.num_depth_bins,
            depth_binning=opt.depth_binning,
            bin_chunk=opt.bin_chunk,
            cv_backend=getattr(opt, "cv_backend", "auto"),
            dtype=dtype,
            merged=opt.merged,
            drop_path_rate=opt.drop_path_rate,
            ffn_backend=_ffn_backend_for(
                getattr(opt, "ffn_backend", "auto"), opt.rep_size,
                getattr(opt, "lk_deploy_backend", "auto")),
            lk_deploy_backend=getattr(opt, "lk_deploy_backend", "auto"),
            lk_train_backend=getattr(opt, "lk_train_backend", "lax"),
        )
        self.depth = DepthDecoderV2(
            opt.num_ch_enc, dc=opt.dc, dec_id=opt.dec_id,
            dec_ratio=opt.dec_ratio, dtype=dtype,
        )
        from .replknet import RepLKNet

        self.mono_encoder = RepLKNet(
            rep_size=opt.rep_size,
            drop_path_rate=opt.drop_path_rate,
            use_checkpoint=opt.use_checkpoint,
            adpt_test=adpt,
            g_blk=opt.g_blk,
            g_ffn=opt.g_ffn,
            ratio=opt.ratio,
            trans_adpt=opt.mono_trans,
            input_adpt=opt.mono_input,
            dtype=dtype,
            merged=opt.merged,
            ffn_backend=_ffn_backend_for(
                getattr(opt, "ffn_backend", "auto"), opt.rep_size,
                getattr(opt, "lk_deploy_backend", "auto")),
            lk_deploy_backend=getattr(opt, "lk_deploy_backend", "auto"),
            lk_train_backend=getattr(opt, "lk_train_backend", "lax"),
        )
        self.mono_depth = DepthDecoderV2(
            opt.num_ch_enc, dc=opt.dc, dec_id=opt.dec_id,
            dec_ratio=opt.dec_ratio, dtype=dtype,
        )
        self.pose_encoder = ResnetEncoder(
            num_layers=18, num_input_images=2
        )
        self.pose = PoseDecoder(
            self.pose_encoder.num_ch_enc,
            num_input_features=1,
            num_frames_to_predict_for=2,
        )

    # ------------------------------------------------------------------ #

    def _pose_pair(self, a, b, invert, train):
        """Pose from a temporally-ordered image pair.

        The encoder+decoder pair is rematerialized in the backward pass
        (--remat_pose, default on): its saved residuals are otherwise
        ~960 MB at bs 12 — two f32 [B,96,320,64] conv1 outputs plus two
        normalized 6-channel inputs that XLA stores at ~8x layout
        padding — while the recompute is one ResNet-18 forward (~2 ms).
        With remat, the only residuals are the color frames, which are
        already resident as jit arguments. Gradients are bit-identical
        (jax.checkpoint semantics)."""
        def _nets(mdl, a, b, train):
            feats = mdl.pose_encoder(jnp.concatenate([a, b], axis=-1),
                                     train)
            return mdl.pose([feats])

        if self.opt.remat_pose:
            _nets = nn.remat(_nets, static_argnums=(3,))
        axisangle, translation = _nets(self, a, b, train)
        T = transformation_from_parameters(
            axisangle[:, 0, 0], translation[:, 0, 0], invert=invert
        )
        return axisangle, translation, T

    def predict_poses(self, inputs, train: bool = False,
                      stop_grad: bool = False):
        """Poses for the loss (frame_ids) and chained no-grad poses for
        matching (matching_ids). repdepth.py:443-509."""
        opt = self.opt
        outputs = {}
        feats = {
            f_i: inputs[("color_aug", f_i, 0)] for f_i in opt.frame_ids
        }
        for f_i in opt.frame_ids[1:]:
            if f_i < 0:
                pair = (feats[f_i], feats[0])
            else:
                pair = (feats[0], feats[f_i])
            axisangle, translation, T = self._pose_pair(
                pair[0], pair[1], invert=(f_i < 0), train=train
            )
            if stop_grad:
                axisangle = jax.lax.stop_gradient(axisangle)
                translation = jax.lax.stop_gradient(translation)
                T = jax.lax.stop_gradient(T)
            outputs[("axisangle", 0, f_i)] = axisangle
            outputs[("translation", 0, f_i)] = translation
            outputs[("cam_T_cam", 0, f_i)] = T

        # matching poses: chained 0->-1->-2..., always gradient-free
        mfeats = {
            f_i: inputs[("color_aug", f_i, 0)] for f_i in opt.matching_ids
        }
        rel = {}
        for fi in opt.matching_ids[1:]:
            if fi < 0:
                _, _, T = self._pose_pair(
                    mfeats[fi], mfeats[fi + 1], invert=True, train=train
                )
                if fi != -1:
                    T = T @ rel[fi + 1]
            else:
                _, _, T = self._pose_pair(
                    mfeats[fi - 1], mfeats[fi], invert=False, train=train
                )
                if fi != 1:
                    T = T @ rel[fi - 1]
            # zero pose for blank (missing) frames — repdepth.py:502-506
            blank = jnp.sum(mfeats[fi], axis=(1, 2, 3)) == 0
            T = jnp.where(blank[:, None, None], 0.0, T)
            rel[fi] = jax.lax.stop_gradient(T)
        for fi, T in rel.items():
            outputs[("relative_pose", fi)] = T
        return outputs

    # ------------------------------------------------------------------ #

    def forward_mono(self, image, train: bool = False):
        """Teacher single-frame path (the flagship inference path:
        trainer.py:751, evaluate_depth.py:167)."""
        feats = self.mono_encoder(image, train)
        return self.mono_depth(feats, train)

    def forward_multi(self, image, lookup_frames, rel_poses, K2, invK2,
                      min_depth_bin, max_depth_bin, train: bool = False,
                      aug_mask=None):
        """Student multi-frame path (used standalone by validation,
        trainer.py:741-742)."""
        opt = self.opt
        features, lowest_cost, conf = self.encoder(
            image, lookup_frames, rel_poses, K2, invK2,
            min_depth_bin, max_depth_bin, train,
            aug_mask=aug_mask,
            dyn=opt.dyn_cv,
            cv_min=opt.cv_min,
            cv_set_1=opt.cv_set_1,
            cv_pool=opt.cv_pool,
            cv_pool_radius=opt.cv_pool_radius,
            cv_pool_th=opt.cv_pool_th,
        )
        out = self.depth(features, train)
        return out, lowest_cost, conf

    def __call__(self, inputs: Dict, min_depth_bin, max_depth_bin,
                 train: bool = False, freeze_tp: bool = False,
                 freeze_pose: bool = False) -> Tuple[Dict, Dict]:
        """Full training forward. repdepth.py:529-624.

        inputs: dict with ('color'/'color_aug', f, 0) NHWC images and
        ('K', 2)/('inv_K', 2) intrinsics at matching scale.
        Returns (mono_outputs, outputs).
        """
        opt = self.opt
        mono_outputs = {}
        outputs = {}

        pose_pred = self.predict_poses(
            inputs, train=train, stop_grad=(freeze_tp or freeze_pose)
        )
        outputs.update(pose_pred)
        mono_outputs.update(pose_pred)

        rel_poses = jnp.stack(
            [pose_pred[("relative_pose", i)] for i in opt.matching_ids[1:]],
            axis=1,
        )  # [B, F, 4, 4]
        lookup_frames = jnp.stack(
            [inputs[("color_aug", i, 0)] for i in opt.matching_ids[1:]],
            axis=1,
        )  # [B, F, H, W, 3]
        B = lookup_frames.shape[0]

        # matching augmentation (repdepth.py:559-577): per-sample
        # rand<0.25 -> static-camera (lookup replaced by current frame);
        # rand<0.5 -> zeroed poses (cost volume skips those frames).
        if train and not opt.no_matching_augmentation:
            u = jax.random.uniform(self.make_rng("aug"), (B,))
            static_aug = u < 0.25
            zero_aug = (u >= 0.25) & (u < 0.5)
            current = inputs[("color", 0, 0)][:, None]  # non-aug frame
            lookup_frames = jnp.where(
                static_aug[:, None, None, None, None], current, lookup_frames
            )
            rel_poses = jnp.where(
                zero_aug[:, None, None, None], 0.0, rel_poses
            )
            augmentation_mask = (
                (static_aug | zero_aug).astype(jnp.float32)
            ).reshape(B, 1, 1, 1)
        else:
            augmentation_mask = jnp.zeros((B, 1, 1, 1), jnp.float32)
        outputs["augmentation_mask"] = augmentation_mask

        # teacher
        img_aug = inputs[("color_aug", 0, 0)]
        mono_out = self.forward_mono(img_aug, train)
        if freeze_tp:
            mono_out = jax.tree_util.tree_map(
                jax.lax.stop_gradient, mono_out
            )
        mono_outputs.update(mono_out)
        outputs[("mono_disp", 0)] = mono_outputs[("disp", 0)]

        # student with cost volume at matching (1/4) scale intrinsics
        multi_out, lowest_cost, conf = self.forward_multi(
            img_aug, lookup_frames, rel_poses,
            inputs[("K", 2)], inputs[("inv_K", 2)],
            min_depth_bin, max_depth_bin, train,
            aug_mask=augmentation_mask,
        )
        outputs.update(multi_out)

        H, W = opt.height, opt.width
        outputs["lowest_cost"] = resize_nearest(
            lowest_cost[..., None], H, W
        )[..., 0]
        outputs["consistency_mask"] = resize_nearest(
            conf[..., None], H, W
        )[..., 0]
        return mono_outputs, outputs
