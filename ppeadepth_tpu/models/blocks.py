"""Shared conv building blocks (flax.linen, NHWC).

conv_bn / conv_bn_relu mirror replknet.py:51-66; Conv3x3/ConvBlock mirror
layers.py:103-135 (reflection padding + ELU). BatchNorm statistics live in
the `batch_stats` collection; under a global-view jit over a sharded batch
the batch statistics are computed over the *global* batch, i.e. cross
replica ("SyncBN") semantics fall out for free — the reference has to opt
into torch.nn.SyncBatchNorm for the student encoder
(replk_matching_adapter.py:68, replknet_adapter.py:170-180).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
from flax.linen.dtypes import promote_dtype

from ..kernels.lk_conv import depthwise_conv2d

from .norm import BatchNorm as TorchBatchNorm  # torch-parity running_var


class DepthwiseConv(nn.Module):
    """Depthwise conv whose execution routes through kernels.lk_conv
    (lax or pallas backend); owns the HWIO weight with I=1 (always f32;
    compute follows the input dtype).

    `banded=True` (deploy-only, set by ReparamLKConv via
    --lk_deploy_backend) additionally looks for a per-conv banded
    weight table in the 'banded' variable collection — built by
    ckpt/deploy.banded_tables from the merged kernel — and runs the
    MXU banded-matmul kernel (kernels/banded_conv.py) when the input
    satisfies its alignment contract (stride 1, B % 8 == 0, matching
    table width). Anything else falls back to the lax path with the
    ordinary 'kernel' param, which deploy trees keep alongside T.

    `banded_train=True` (set by ReparamLKConv via --lk_train_backend)
    runs the DIFFERENTIABLE banded kernel in training instead: tables
    are rebuilt from the conv param inside the step (no persistent
    HBM), d/dx is the flipped-table banded conv, d/dw the exact lax
    pullback (DCE'd under PPEA's frozen backbone). Requires stride 1,
    per-device batch % 4 == 0, W % 8 == 0; dispatches per-shard over
    the active dp mesh (pallas custom calls do not GSPMD-partition)."""

    features: int
    kernel_size: int
    stride: int = 1
    use_bias: bool = False
    banded: bool = False
    banded_train: bool = False

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, 1, self.features),
        )
        y = self._banded(x) if self.banded else None
        if y is None and self.banded_train:
            y = self._banded_train(x, w)
        if y is None:
            y = depthwise_conv2d(x, w.astype(x.dtype), stride=self.stride)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y

    def _banded(self, x):
        if not (
            x.ndim == 4
            and self.stride == 1
            and x.shape[2] % 8 == 0
            and self.has_variable("banded", "T")
        ):
            self._warn_banded_fallback(x, None)
            return None
        T = self.get_variable("banded", "T")
        W = x.shape[2]
        if T.shape != (self.features, W, self.kernel_size * W):
            self._warn_banded_fallback(x, T.shape)
            return None  # table built for a different resolution
        from ..kernels.banded_conv import banded_depthwise

        y = banded_depthwise(
            x.astype(T.dtype), T, self.kernel_size,
            interpret=jax.default_backend() != "tpu",
        )
        return y.astype(x.dtype)

    def _warn_banded_fallback(self, x, table_shape):
        """Trace-time warning: a banded-enabled deploy conv silently
        reverting to the lax path is a perf foot-gun — on XL it also
        resurrects the FFN-kernel layout-poisoned stage-0 conv
        (BENCHMARKS.md XL close-out), since ffn 'auto' assumes banded
        owns stage 0. Fires once per trace, never during init."""
        if self.is_initializing():
            return
        import logging

        logging.getLogger(__name__).warning(
            "banded LK conv %s falling back to the lax path "
            "(input %s, stride %d, table %s): rebuild banded tables "
            "for this resolution (ckpt.deploy.banded_tables) or set "
            "--lk_deploy_backend lax to silence; on XL this fallback "
            "also re-exposes the FFN layout-poisoned stage-0 conv "
            "(pass --ffn_backend lax,auto,auto,auto there).",
            "/".join(self.scope.path) if self.scope else "?",
            x.shape, self.stride, table_shape,
        )

    def _banded_train(self, x, w):
        from ..kernels.banded_conv import banded_depthwise_train
        from ..parallel.mesh import shard_batch_call

        if self.is_initializing() or not (
            x.ndim == 4
            and self.stride == 1
            and x.shape[2] % 8 == 0
        ):
            return None
        interp = jax.default_backend() != "tpu"
        k = self.kernel_size
        # tables follow the compute dtype, like the lax path's
        # w.astype(x.dtype): bf16 under the training compute policy,
        # f32 (exact vs lax) under f32 compute
        mm_dtype = x.dtype
        call = shard_batch_call(
            lambda xx, ww: banded_depthwise_train(
                xx, ww, k, interp, mm_dtype),
            in_specs=(True, False), out_specs=True,
        )
        return call(x, w)


class ConvBN(nn.Module):
    """conv(bias-free) + BN [+ ReLU]; depthwise when groups == features.
    `dtype` is the compute dtype (params stay f32; BN statistics f32)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: Optional[int] = None
    groups: int = 1
    relu: bool = False
    banded_train: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        pad = self.kernel_size // 2 if self.padding is None else self.padding
        if self.groups == self.features and self.features == x.shape[-1]:
            # depthwise path (routes through the LK kernel backend)
            if pad != self.kernel_size // 2:
                raise ValueError("depthwise path assumes same padding")
            x = DepthwiseConv(
                self.features, self.kernel_size, self.stride,
                banded_train=self.banded_train, name="conv"
            )(x)
        else:
            x = nn.Conv(
                self.features,
                (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding=((pad, pad), (pad, pad)),
                feature_group_count=self.groups,
                use_bias=False,
                dtype=self.dtype,
                name="conv",
            )(x)
        x = TorchBatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.relu:
            x = nn.relu(x)
        return x


class _ReflectConv3x3(nn.Module):
    """SAME-padded 3x3 conv + thin border corrections == reflect-pad conv.

    Named 'conv' by its parent so the checkpoint path (conv/kernel,
    conv/bias) and initializers match the nn.Conv it replaces."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        x, kernel, bias = promote_dtype(x, kernel, bias, dtype=self.dtype)
        y = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
        W = x.shape[2]

        def strip1d(s, k1):
            # s: [B, L+2, C] (ends already carry the pad values);
            # k1: [3, Ci, Co]. 1D valid conv along L.
            L = s.shape[1] - 2
            return sum(jnp.einsum("blc,cd->bld", s[:, kc:kc + L], k1[kc])
                       for kc in range(3))

        # pad row -1 == x[:, 1] and row H == x[:, -2], each with their own
        # reflected column ends (covers the 4 pad corners exactly once)
        def row_strip(xr):
            return jnp.concatenate(
                [xr[:, 1:2], xr, xr[:, -2:-1]], axis=1)

        top = strip1d(row_strip(x[:, 1]), kernel[0])
        bot = strip1d(row_strip(x[:, -2]), kernel[2])
        # pad col -1 == x[:, :, 1] and col W == x[:, :, -2], rows 0..H-1
        # only (the pad-corner rows belong to the strips above) -> zero
        # row ends
        zpad = ((0, 0), (1, 1), (0, 0))
        lft = strip1d(jnp.pad(x[:, :, 1], zpad), kernel[:, 0])
        rgt = strip1d(jnp.pad(x[:, :, -2], zpad), kernel[:, 2])
        y = y.at[:, 0].add(top).at[:, -1].add(bot)
        y = y.at[:, :, 0].add(lft).at[:, :, W - 1].add(rgt)
        return y


class Conv3x3(nn.Module):
    """Reflection-padded 3x3 conv (layers.py:119-135).

    Computed as a SAME-(zero-)padded conv plus four thin border-strip
    corrections instead of materializing the reflect-padded tensor: the
    interior is the identical conv, and the border strips add exactly
    the reflected-pad contributions (one 1D 3-tap conv per edge, corners
    counted once via the row strips). Why: XLA stores the padded
    full-res decoder activations in a C-minor tiled layout at ~5.3x
    their bytes, and the pad's BACKWARD is a chain of slice+add_any
    scatter fusions at that same padded bandwidth — measured 18.6
    ms/step across the two decoders at bs 12 (tools/attr_ops.py). The
    strip form removes both the padded buffer and its backward; border
    sums differ from the single-dot padded conv only in f32 addition
    order (~1 ulp on the 1-px border).

    remat is accepted for API compatibility (it wrapped the old padded
    form; with no padded buffer there is nothing left to save)."""

    features: int
    dtype: Optional[jnp.dtype] = None
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        return _ReflectConv3x3(self.features, self.dtype, name="conv")(x)


class ConvBlock(nn.Module):
    """Conv3x3 + ELU (layers.py:103-116)."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.elu(Conv3x3(self.features, self.dtype, name="conv")(x))


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath semantics: keep-prob
    scaling, whole-residual drop). Uses the 'droppath' rng stream."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return x * mask.astype(x.dtype) / keep
