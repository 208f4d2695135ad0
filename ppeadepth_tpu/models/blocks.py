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

from ..kernels.lk_conv import depthwise_conv2d


class DepthwiseConv(nn.Module):
    """Depthwise conv whose execution routes through kernels.lk_conv
    (lax or pallas backend); owns the HWIO weight with I=1 (always f32;
    compute follows the input dtype)."""

    features: int
    kernel_size: int
    stride: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, 1, self.features),
        )
        y = depthwise_conv2d(x, w.astype(x.dtype), stride=self.stride)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


class ConvBN(nn.Module):
    """conv(bias-free) + BN [+ ReLU]; depthwise when groups == features.
    `dtype` is the compute dtype (params stay f32; BN statistics f32)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: Optional[int] = None
    groups: int = 1
    relu: bool = False
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
                self.features, self.kernel_size, self.stride, name="conv"
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
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.relu:
            x = nn.relu(x)
        return x


class Conv3x3(nn.Module):
    """Reflection-padded 3x3 conv (layers.py:119-135).

    The pad + conv pair is wrapped in jax.checkpoint (nn.remat): under AD
    the conv's weight-gradient residual is the PADDED tensor, which XLA
    stores in a C-minor tiled layout that pads the few-channel decoder
    activations ~5x (measured: four 486 MB temps for 95 MB of data at
    bs 12 full-res — ~2.4 GB of peak HBM across the two decoders).
    Checkpointing saves the unpadded input instead and recomputes the
    pad (one concat) in the backward; the conv itself is dead code in
    the recompute (its output is not a residual of its own VJP), so the
    cost is bandwidth-trivial. remat=False restores the plain path."""

    features: int
    dtype: Optional[jnp.dtype] = None
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        conv = nn.Conv(
            self.features, (3, 3), padding="VALID", dtype=self.dtype,
            name="conv"
        )

        def _pad_conv(mdl, inp):
            return mdl(jnp.pad(
                inp, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect"))

        if self.remat:
            # prevent_cse=True is REQUIRED: with CSE allowed, XLA merges
            # the backward recompute of the pad with the forward pad and
            # the padded buffer stays live — zero memory saved (measured:
            # the four 486 MB temps survive prevent_cse=False intact).
            _pad_conv = nn.remat(_pad_conv)
        return _pad_conv(conv, x)


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
