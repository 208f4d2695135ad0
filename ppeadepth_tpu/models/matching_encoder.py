"""Multi-frame matching encoder: RepLKNet with a plane-sweep cost volume
spliced in after stage 0.

Mirrors RepLKMatching / RepLKMatchingAdapter (replk_matching.py:251-302,
replk_matching_adapter.py:389-476) — one module covers both (adapters are
configured on the inner RepLKNet):

  current feats  = stem + stage0 (with gradients)
  lookup feats   = same, gradient-free
  cost volume    = batched plane sweep over `num_depth_bins` hypotheses,
                   gradient-free (the reference wraps it in torch.no_grad)
  fusion         = ReLU(Conv3x3(concat(current_feats, cost_volume)))
                   ("reduce_conv", which STAYS trainable when the backbone
                   freezes — the 'reduce' predicate in repdepth.py:49)
  resume         = transitions + stages 1..3 for the 4-level pyramid

The adaptive min/max depth-bin scalars are jit-traced inputs (they come
from the EMA tracker in the train state), so recomputing bins per step
costs nothing.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .replknet import RepLKNet
from ..ops import cost_volume as CV


class RepLKMatching(nn.Module):
    rep_size: str = "b"
    use_checkpoint: bool = False
    # adapter config forwarded to the backbone; adpt_test < 0 = plain
    adpt_test: int = -1
    g_blk: float = 1.0
    g_ffn: float = 1.0
    ratio: float = 0.25
    trans_adpt: bool = False
    input_adpt: bool = False
    merged: bool = False
    num_depth_bins: int = 96
    depth_binning: str = "log"
    bin_chunk: int = 16
    cv_backend: str = "auto"  # plane-sweep backend (ops/cost_volume.py)
    dtype: object = None
    drop_path_rate: float = 0.3  # reference hardcodes 0.3 (repdepth.py:95)
    ffn_backend: str = "lax"
    lk_deploy_backend: str = "lax"
    lk_train_backend: str = "lax"

    def setup(self):
        self.replk = RepLKNet(
            rep_size=self.rep_size,
            drop_path_rate=self.drop_path_rate,
            use_checkpoint=self.use_checkpoint,
            adpt_test=self.adpt_test,
            g_blk=self.g_blk,
            g_ffn=self.g_ffn,
            ratio=self.ratio,
            trans_adpt=self.trans_adpt,
            input_adpt=self.input_adpt,
            merged=self.merged,
            ffn_backend=self.ffn_backend,
            lk_deploy_backend=self.lk_deploy_backend,
            lk_train_backend=self.lk_train_backend,
            dtype=self.dtype,
        )
        # Conv3x3(C0 + D -> C0) + ReLU; plain conv with bias, no BN
        # (replk_matching.py:90-94)
        c0 = self.replk.channels[0]
        self.reduce_conv = nn.Conv(c0, (3, 3), padding=1, dtype=self.dtype)

    @property
    def num_ch_enc(self) -> Sequence[int]:
        return self.replk.channels

    def feature_extraction(self, image, train: bool = False):
        """stem + stage 0 -> features at 1/4 res
        (replk_matching.py:208-231)."""
        x = self.replk.forward_stem(image, train)
        x = self.replk.forward_stage(0, x, train)
        return x

    def __call__(
        self,
        current_image,
        lookup_images,
        poses,
        K,
        invK,
        min_depth_bin,
        max_depth_bin,
        train: bool = False,
        aug_mask=None,
        dyn: bool = False,
        cv_min: bool = False,
        cv_set_1: bool = False,
        cv_pool: bool = True,
        cv_pool_radius: int = 1,
        cv_pool_th: float = 0.7,
    ):
        """current_image: [B, H, W, 3]; lookup_images: [B, F, H, W, 3];
        poses: [B, F, 4, 4]; K/invK: [B, 4, 4] at 1/4 (matching) scale.

        `dyn` enables the DynamicDepth-style cost volume (min-over-frames +
        occlusion in-fill, match_features_dyn) used for dynamic-scene
        stage-2 training. NOTE: the reference snapshot never wires this
        from RepDepth.forward (its teacher_depth argument is never passed,
        replk_matching_adapter.py:389-445), so `dyn=False` is the parity
        default; the capability is exposed for the paper's --dc pipeline.

        Returns (features[4], lowest_cost [B, H/4, W/4],
        confidence_mask [B, H/4, W/4]).
        """
        B, H, W, _ = current_image.shape
        F_ = lookup_images.shape[1]

        cur = self.feature_extraction(current_image, train)

        # lookup features: gradient-free (replk_matching.py:265-281). BN
        # running stats still update, as under torch.no_grad.
        lk = self.feature_extraction(
            lookup_images.reshape(B * F_, H, W, 3), train
        )
        lk = jax.lax.stop_gradient(lk).reshape(B, F_, *lk.shape[1:])

        bins = CV.compute_depth_bins(
            min_depth_bin, max_depth_bin, self.num_depth_bins,
            self.depth_binning,
        )
        if dyn:
            # DynamicDepth-style volume: per-frame occlusion in-fill on
            # the warped FEATURES before the diff, then min/average over
            # frames (match_features_dyn, replk_matching_adapter.py:
            # 163-258). Feature-level in-fill needs the materialized
            # warped tensors, so this path is lax-only (no MXU cost
            # kernel) — it is the stage-2 CityScapes fine-tune recipe,
            # not the serving hot loop.
            if aug_mask is None:
                aug_mask = jnp.zeros((B, 1, 1, 1), jnp.float32)
            cost, missing = CV.plane_sweep_cost_volume_dyn(
                jax.lax.stop_gradient(cur).astype(jnp.float32),
                lk.astype(jnp.float32),
                jax.lax.stop_gradient(poses),
                K,
                invK,
                bins,
                jax.lax.stop_gradient(lookup_images),
                jax.lax.stop_gradient(aug_mask),
                cv_min=cv_min,
                set_1=cv_set_1,
                pool=cv_pool,
                pool_r=cv_pool_radius,
                pool_th=cv_pool_th,
            )
        else:
            cost, missing = CV.plane_sweep_cost_volume(
                jax.lax.stop_gradient(cur).astype(jnp.float32),
                lk.astype(jnp.float32),
                jax.lax.stop_gradient(poses),
                K,
                invK,
                bins,
                bin_chunk=self.bin_chunk,
                backend=CV.resolve_cv_backend(self.cv_backend),
            )  # [B, D, h, w]
        conf = CV.confidence_mask(
            jax.lax.stop_gradient(cost), jax.lax.stop_gradient(missing)
        )  # [B, h, w]
        lowest_cost = CV.lowest_cost_disparity(
            jax.lax.stop_gradient(cost), bins
        )

        cost_nhwc = jnp.transpose(cost, (0, 2, 3, 1)) * conf[..., None]
        x = nn.relu(
            self.reduce_conv(jnp.concatenate([cur, cost_nhwc], axis=-1))
        )

        features = [self.replk.stages[0].apply_norm(cur, train)]
        for stage_idx in range(1, 4):
            x = self.replk.forward_transition(stage_idx - 1, x, train)
            x = self.replk.forward_stage(stage_idx, x, train)
            features.append(self.replk.stages[stage_idx].apply_norm(x, train))
        return features, lowest_cost, conf
