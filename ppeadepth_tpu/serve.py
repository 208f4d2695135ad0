"""Inference session: the deployment-facing API.

Loads a checkpoint (native msgpack, or a reference torch model.pth via the
importer), optionally applies deploy-time structural reparameterisation
(BN fold + small-kernel merge -> `Config.merged` model), and jits the
forward paths once:

  session.predict_depth(images)                 teacher depth [B, H, W]
  session.predict_depth_multi(img, lookup, K)   student (cost volume) depth
  session.predict_pose(a, b)                    relative camera pose [B,4,4]

Images are float32 in [0,1] or uint8 NHWC. Depths are metric after
disp_to_depth with the config's min/max depth (median scaling is an eval
protocol concern, eval/metrics.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ckpt import io as ckpt_io
from .ckpt.deploy import structural_reparam
from .core.geometry import disp_to_depth, transformation_from_parameters
from .models import RepDepth
from .options import Config


class InferenceSession:
    def __init__(
        self,
        opt: Config,
        checkpoint: Optional[str] = None,
        torch_checkpoint: Optional[str] = None,
        merge_reparam: bool = True,
        dtype: str = "bfloat16",
    ):
        opt = opt.with_mode_presets().replace(
            compute_dtype=dtype, merged=False
        )
        from .train.trainer import synthetic_batch

        variables = jax.jit(
            lambda: RepDepth(opt).init(
                {"params": jax.random.PRNGKey(0),
                 "droppath": jax.random.PRNGKey(1),
                 "aug": jax.random.PRNGKey(2)},
                synthetic_batch(opt, 1), 0.1, 10.0, False,
            )
        )()
        self.min_depth_bin = 0.1
        self.max_depth_bin = 10.0

        if torch_checkpoint:
            from .ckpt.torch_import import load_torch_repdepth

            params, stats, _, _ = load_torch_repdepth(
                torch_checkpoint, variables["params"],
                variables["batch_stats"],
            )
            variables = {"params": params, "batch_stats": stats}
        elif checkpoint:
            params, stats, track = ckpt_io.load_model(
                checkpoint, variables["params"], variables["batch_stats"]
            )
            variables = {"params": params, "batch_stats": stats}
            self.min_depth_bin = track.get("min_depth_bin", 0.1)
            self.max_depth_bin = track.get("max_depth_bin", 10.0)

        if merge_reparam:
            mp, ms = structural_reparam(
                variables["params"], variables["batch_stats"]
            )
            variables = {"params": mp, "batch_stats": ms}
            opt = opt.replace(merged=True)
            if (
                jax.default_backend() == "tpu"
                and dtype == "bfloat16"
                and opt.lk_deploy_backend != "lax"
            ):
                # banded MXU tables for the stage-0/1 LK convs
                # (kernels/banded_conv.py; resolution-bound — convs fall
                # back to lax at other input sizes or B % 8 != 0)
                from .ckpt.deploy import banded_tables

                bt = banded_tables(mp, (opt.height, opt.width))
                if bt:
                    variables["banded"] = bt

        self.opt = opt
        self.model = RepDepth(opt)
        self.variables = variables
        self._mono_fn = None
        self._multi_fn = None
        self._pose_fn = None

    # ------------------------------------------------------------------ #

    @staticmethod
    def _to_float(images):
        images = jnp.asarray(images)
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        return images

    def predict_depth(self, images) -> np.ndarray:
        """images: [B, H, W, 3] -> metric depth [B, H, W]."""
        if self._mono_fn is None:
            model, opt = self.model, self.opt

            @jax.jit
            def fn(variables, img):
                out = model.apply(
                    variables, img, False, method=RepDepth.forward_mono
                )
                _, depth = disp_to_depth(
                    out[("disp", 0)][..., 0].astype(jnp.float32),
                    opt.min_depth, opt.max_depth,
                )
                return depth

            self._mono_fn = fn
        return np.asarray(self._mono_fn(self.variables, self._to_float(images)))

    def predict_pose(self, frame_a, frame_b, invert: bool = False):
        """Relative pose from a temporally-ordered pair -> [B, 4, 4]."""
        if self._pose_fn is None:
            model = self.model

            def fn(variables, a, b, inv):
                feats = model.apply(
                    variables, jnp.concatenate([a, b], -1), False,
                    method=lambda m, x, t: m.pose_encoder(x, t),
                )
                aa, tt = model.apply(
                    variables, [feats], method=lambda m, f: m.pose(f)
                )
                return transformation_from_parameters(
                    aa[:, 0, 0], tt[:, 0, 0], invert=inv
                )

            self._pose_fn = jax.jit(fn, static_argnames=("inv",))
        return np.asarray(self._pose_fn(
            self.variables, self._to_float(frame_a),
            self._to_float(frame_b), inv=invert,
        ))

    def predict_depth_multi(self, images, lookup, K, invK) -> np.ndarray:
        """Student path: current + previous frame + matching-scale (1/4)
        intrinsics -> metric depth [B, H, W]."""
        if self._multi_fn is None:
            model, opt = self.model, self.opt

            @jax.jit
            def fn(variables, img, lk, K2, invK2, min_bin, max_bin):
                feats = model.apply(
                    variables, jnp.concatenate([lk, img], -1), False,
                    method=lambda m, x, t: m.pose_encoder(x, t),
                )
                aa, tt = model.apply(
                    variables, [feats], method=lambda m, f: m.pose(f)
                )
                T = transformation_from_parameters(
                    aa[:, 0, 0], tt[:, 0, 0], invert=True
                )
                out, _, _ = model.apply(
                    variables, img, lk[:, None], T[:, None], K2, invK2,
                    min_bin, max_bin, False,
                    method=RepDepth.forward_multi,
                )
                _, depth = disp_to_depth(
                    out[("disp", 0)][..., 0].astype(jnp.float32),
                    opt.min_depth, opt.max_depth,
                )
                return depth

            self._multi_fn = fn
        return np.asarray(self._multi_fn(
            self.variables, self._to_float(images), self._to_float(lookup),
            jnp.asarray(K), jnp.asarray(invK),
            jnp.asarray(self.min_depth_bin, jnp.float32),
            jnp.asarray(self.max_depth_bin, jnp.float32),
        ))
