"""RepLKNet-31B/L/XL large-kernel backbone with optional PEA adapters.

Structure follows the reference (replknet.py:205-398 for the plain net,
replknet_adapter.py:381-644 for the adapter variant — here one module with
`adpt_test < 0` meaning "no adapters"), re-expressed in flax/NHWC:

  stem: conv3x3 s2 -> dw3x3 -> conv1x1 -> dw3x3 s2            (1/4 res)
  4 stages of num_blocks x (RepLKBlock, ConvFFN) pairs
  transitions: conv1x1 + dw3x3 s2 between stages
  Swin-style linear drop-path schedule over block pairs (0 -> rate)

RepLKBlock: prelkb_bn -> pw1(1x1 conv-bn-relu) -> reparam large-kernel dw
conv -> relu -> pw2(1x1 conv-bn), residual with drop-path, plus the PEA
parallel branch `g_blk * B_Adapter(prelkb_bn(x))` (replknet_adapter.py:
292-326). ConvFFN: preffn_bn -> 1x1 -> GELU -> 1x1, residual, plus
`g_ffn * ChannelAdapter(preffn_bn(x))` (replknet_adapter.py:264-289).

`adpt_test` routing matches RepLKNetStage (replknet_adapter.py:339-354):
5 -> adapters only in ConvFFN; 6 -> only in RepLKBlock (as type 4);
the shipped config is 4 (ckpt/models/opt.json).

Activation checkpointing (`use_checkpoint`) wraps each block in
`nn.remat`, the jax analogue of the reference's per-block
torch.utils.checkpoint (replknet.py:197-203).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import numpy as np

from .adapters import BAdapter, ChannelAdapter, InputAdapter
from .blocks import ConvBN, DepthwiseConv, DropPath
from ..kernels.banded_conv import (
    resolve_lk_deploy_backend, resolve_lk_train_backend, stage_backends)
from .norm import BatchNorm as TorchBatchNorm  # torch-parity running_var

REPLK_CONFIGS = {
    "b": dict(
        large_kernel_sizes=(31, 29, 27, 13),
        layers=(2, 2, 18, 2),
        channels=(128, 256, 512, 1024),
        small_kernel=5,
        dw_ratio=1.0,
    ),
    "l": dict(
        large_kernel_sizes=(31, 29, 27, 13),
        layers=(2, 2, 18, 2),
        channels=(192, 384, 768, 1536),
        small_kernel=5,
        dw_ratio=1.0,
    ),
    "xl": dict(
        large_kernel_sizes=(27, 27, 27, 13),
        layers=(2, 2, 18, 2),
        channels=(256, 512, 1024, 2048),
        small_kernel=None,
        dw_ratio=1.5,
    ),
    # tiny config for tests and the multichip dry-run (not in the reference)
    "t": dict(
        large_kernel_sizes=(7, 7, 5, 3),
        layers=(1, 1, 2, 1),
        channels=(16, 32, 64, 128),
        small_kernel=3,
        dw_ratio=1.0,
    ),
}


class ReparamLKConv(nn.Module):
    """Training: large dw conv+BN parallel to a small dw conv+BN, summed.
    Deploy (`merged=True`): single biased dw conv; weights produced by
    kernels.lk_conv.merge_reparam_kernels. Reference: replknet.py:79-130."""

    features: int
    kernel_size: int
    small_kernel: Optional[int]
    stride: int = 1
    merged: bool = False
    lk_deploy_backend: str = "lax"
    lk_train_backend: str = "lax"
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        if self.merged:
            backend = resolve_lk_deploy_backend(
                self.lk_deploy_backend, self.merged, self.dtype or x.dtype)
            return DepthwiseConv(
                self.features, self.kernel_size, self.stride,
                use_bias=True, banded=backend == "banded",
                name="lkb_reparam",
            )(x)
        train_backend = resolve_lk_train_backend(
            self.lk_train_backend, self.dtype or x.dtype)
        out = ConvBN(
            self.features, self.kernel_size, self.stride,
            groups=self.features, dtype=self.dtype,
            banded_train=train_backend == "banded" and self.stride == 1,
            name="lkb_origin",
        )(x, train)
        if self.small_kernel is not None:
            out = out + ConvBN(
                self.features, self.small_kernel, self.stride,
                groups=self.features, dtype=self.dtype, name="small_conv",
            )(x, train)
        return out


class RepLKBlock(nn.Module):
    channels: int
    dw_channels: int
    lk_size: int
    small_kernel: Optional[int]
    drop_path: float
    adpt_test: int = -1
    g_blk: float = 1.0
    ratio: float = 0.25
    merged: bool = False
    lk_deploy_backend: str = "lax"
    lk_train_backend: str = "lax"
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="prelkb_bn",
        )(x)
        adpt = None
        if self.adpt_test >= 0:
            adpt = BAdapter(
                self.channels, self.adpt_test, self.ratio,
                dtype=self.dtype, name="adapter"
            )(out)
        out = ConvBN(self.dw_channels, 1, relu=True, dtype=self.dtype,
                     name="pw1")(out, train)
        out = ReparamLKConv(
            self.dw_channels, self.lk_size, self.small_kernel,
            merged=self.merged, lk_deploy_backend=self.lk_deploy_backend,
            lk_train_backend=self.lk_train_backend,
            dtype=self.dtype, name="large_kernel",
        )(out, train)
        out = nn.relu(out)
        out = ConvBN(self.channels, 1, dtype=self.dtype,
                     name="pw2")(out, train)
        res = x + DropPath(self.drop_path, name="drop_path")(out, not train)
        if adpt is not None:
            res = res + self.g_blk * adpt
        return res


class ConvFFN(nn.Module):
    channels: int
    internal_channels: int
    drop_path: float
    adpt_test: int = -1
    g_ffn: float = 1.0
    merged: bool = False
    ffn_backend: str = "lax"  # 'lax' | 'mxu' (fused deploy kernel)
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Fused MXU inference path (kernels/ffn_mxu.py): BN-folded
        # matmul pair + adapter in one pallas call, 4.5x over XLA's
        # ConvFFN fusion on v5e (BENCHMARKS.md round 3). Deploy-only:
        # resolve_ffn_backend gates on merged+TPU+bf16; init and train
        # always take the exact lax path below (which defines params).
        if (not train and not self.is_initializing()
                and self.ffn_backend != "lax"):
            from ..kernels import ffn_mxu

            backend = ffn_mxu.resolve_ffn_backend(
                self.ffn_backend, self.merged, self.dtype or x.dtype)
            if backend == "mxu":
                p = self.variables["params"]
                s = self.variables["batch_stats"]
                folded = ffn_mxu.fold_ffn_params(p, s, g_ffn=self.g_ffn)
                return ffn_mxu.ffn_block_apply(
                    x, folded, interpret=jax.default_backend() != "tpu")

        out = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="preffn_bn",
        )(x)
        adpt = None
        if self.adpt_test >= 0:
            # ConvFFN hardcodes its adapter ratio (0.5 only for adpt_test 2),
            # replknet_adapter.py:273-276
            mlp_ratio = 0.5 if self.adpt_test == 2 else 0.25
            adpt = ChannelAdapter(
                self.channels, mlp_ratio, dtype=self.dtype,
                name="mlp_adapter"
            )(out)
        out = ConvBN(self.internal_channels, 1, dtype=self.dtype,
                     name="pw1")(out, train)
        out = nn.gelu(out, approximate=False)
        out = ConvBN(self.channels, 1, dtype=self.dtype,
                     name="pw2")(out, train)
        res = x + DropPath(self.drop_path, name="drop_path")(out, not train)
        if adpt is not None:
            res = res + self.g_ffn * adpt
        return res


def _route_adpt(adpt_test: int):
    """adpt_test 5/6 routing (replknet_adapter.py:341-347):
    returns (replk_block_adpt, convffn_adpt)."""
    if adpt_test == 5:
        return -1, 1
    if adpt_test == 6:
        return 4, -1
    return adpt_test, adpt_test


class RepLKNetStage(nn.Module):
    channels: int
    num_blocks: int
    lk_size: int
    drop_paths: Sequence[float]
    small_kernel: Optional[int]
    dw_ratio: float = 1.0
    ffn_ratio: float = 4.0
    adpt_test: int = -1
    g_blk: float = 1.0
    g_ffn: float = 1.0
    ratio: float = 0.25
    use_checkpoint: bool = False
    norm_intermediate: bool = False
    merged: bool = False
    ffn_backend: str = "lax"
    lk_deploy_backend: str = "lax"
    lk_train_backend: str = "lax"
    dtype: Optional[object] = None

    def setup(self):
        adpt_r, adpt_c = _route_adpt(self.adpt_test)
        blk_cls = RepLKBlock
        ffn_cls = ConvFFN
        if self.use_checkpoint:
            blk_cls = nn.remat(RepLKBlock, static_argnums=(2,))
            ffn_cls = nn.remat(ConvFFN, static_argnums=(2,))
        blocks = []
        for i in range(self.num_blocks):
            dp = float(self.drop_paths[i])
            blocks.append(
                blk_cls(
                    self.channels,
                    int(self.channels * self.dw_ratio),
                    self.lk_size,
                    self.small_kernel,
                    dp,
                    adpt_test=adpt_r,
                    g_blk=self.g_blk,
                    ratio=self.ratio,
                    merged=self.merged,
                    lk_deploy_backend=self.lk_deploy_backend,
                    lk_train_backend=self.lk_train_backend,
                    dtype=self.dtype,
                )
            )
            blocks.append(
                ffn_cls(
                    self.channels,
                    int(self.channels * self.ffn_ratio),
                    dp,
                    adpt_test=adpt_c,
                    g_ffn=self.g_ffn,
                    merged=self.merged,
                    ffn_backend=self.ffn_backend,
                    dtype=self.dtype,
                )
            )
        self.blocks = blocks
        if self.norm_intermediate:
            self.norm = TorchBatchNorm(momentum=0.9, epsilon=1e-5)

    def __call__(self, x, train: bool = False):
        for blk in self.blocks:
            x = blk(x, train)
        return x

    def apply_norm(self, x, train: bool = False):
        if self.norm_intermediate:
            return self.norm(x, use_running_average=not train)
        return x


class Transition(nn.Module):
    """1x1 conv-bn-relu to the next width + dw 3x3 s2 conv-bn-relu
    (replknet.py:250-254)."""

    features: int
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.features, 1, relu=True, dtype=self.dtype,
                   name="expand")(x, train)
        x = ConvBN(
            self.features, 3, stride=2, groups=self.features, relu=True,
            dtype=self.dtype, name="down",
        )(x, train)
        return x


class RepLKNet(nn.Module):
    """Feature-pyramid RepLKNet (out_indices mode only — the classification
    head of the reference is never used by PPEA-Depth)."""

    rep_size: str = "b"
    drop_path_rate: float = 0.3
    ffn_ratio: float = 4.0
    in_channels: int = 3
    num_input_images: int = 1
    use_checkpoint: bool = False
    merged: bool = False
    ffn_backend: str = "lax"
    lk_deploy_backend: str = "lax"
    lk_train_backend: str = "lax"
    norm_intermediate: bool = False
    # adapter config; adpt_test < 0 disables adapters entirely
    adpt_test: int = -1
    g_blk: float = 1.0
    g_ffn: float = 1.0
    ratio: float = 0.25
    trans_adpt: bool = False
    input_adpt: bool = False
    dtype: Optional[object] = None

    @property
    def config(self):
        return REPLK_CONFIGS[self.rep_size]

    @property
    def channels(self):
        return self.config["channels"]

    def setup(self):
        cfg = self.config
        channels = cfg["channels"]
        layers = cfg["layers"]
        base = channels[0]
        self.stem = [
            ConvBN(base, 3, stride=2, relu=True, dtype=self.dtype),
            ConvBN(base, 3, groups=base, relu=True, dtype=self.dtype),
            ConvBN(base, 1, relu=True, dtype=self.dtype),
            ConvBN(base, 3, stride=2, groups=base, relu=True,
                   dtype=self.dtype),
        ]
        # Swin-style linear drop-path over block pairs (replknet.py:239)
        dpr = np.linspace(0.0, self.drop_path_rate, sum(layers)).tolist()
        # ffn_backend accepts a per-stage comma list ("lax,mxu,mxu,mxu"):
        # the XL layout-poisoning fix keeps the fused kernel everywhere
        # except the stage whose downstream depthwise conv XLA would
        # otherwise lower on the poisoned layout (kernels/ffn_mxu.py).
        if "," in self.ffn_backend:
            ffn_backends = self.ffn_backend.split(",")
            assert len(ffn_backends) == 4, self.ffn_backend
        else:
            ffn_backends = [self.ffn_backend] * 4
        # same per-stage split for the banded LK deploy backend ('auto'
        # gates to stages 0-1, where banded measures faster than lax)
        lk_backends = stage_backends(self.lk_deploy_backend)
        lk_train_backends = stage_backends(self.lk_train_backend)
        stages = []
        transitions = []
        trans_adapters = []
        trans_drop_paths = []
        for i in range(4):
            lo = sum(layers[:i])
            stages.append(
                RepLKNetStage(
                    channels[i],
                    layers[i],
                    cfg["large_kernel_sizes"][i],
                    dpr[lo : lo + layers[i]],
                    cfg["small_kernel"],
                    dw_ratio=cfg["dw_ratio"],
                    ffn_ratio=self.ffn_ratio,
                    adpt_test=self.adpt_test,
                    g_blk=self.g_blk,
                    g_ffn=self.g_ffn,
                    ratio=self.ratio,
                    use_checkpoint=self.use_checkpoint,
                    norm_intermediate=self.norm_intermediate,
                    merged=self.merged,
                    ffn_backend=ffn_backends[i],
                    lk_deploy_backend=lk_backends[i],
                    lk_train_backend=lk_train_backends[i],
                    dtype=self.dtype,
                )
            )
            if i < 3:
                transitions.append(Transition(channels[i + 1], self.dtype))
                if self.trans_adpt:
                    trans_adapters.append(
                        ChannelAdapter(channels[i + 1], zero_init=False)
                    )
                    trans_drop_paths.append(DropPath(dpr[lo]))
        self.stages = stages
        self.transitions = transitions
        if self.trans_adpt:
            self.trans_adapters = trans_adapters
            self.trans_drop_paths = trans_drop_paths
        if self.input_adpt:
            self.input_adapter = InputAdapter(base)

    # --- composable pieces (the matching encoder re-enters mid-network) ---

    def forward_stem(self, x, train: bool = False):
        x = self.stem[0](x, train)
        adpt = None
        if self.input_adpt:
            adpt = self.input_adapter(x, train)
        for layer in self.stem[1:]:
            x = layer(x, train)
        if adpt is not None:
            x = x + adpt
        return x

    def forward_stage(self, idx: int, x, train: bool = False):
        return self.stages[idx](x, train)

    def forward_transition(self, idx: int, x, train: bool = False):
        x = self.transitions[idx](x, train)
        if self.trans_adpt:
            x = x + self.trans_drop_paths[idx](
                self.trans_adapters[idx](x), not train
            )
        return x

    def __call__(self, x, train: bool = False):
        """Returns the 4-level feature pyramid [1/4, 1/8, 1/16, 1/32]."""
        x = self.forward_stem(x, train)
        feats = []
        for i in range(4):
            x = self.forward_stage(i, x, train)
            feats.append(self.stages[i].apply_norm(x, train))
            if i < 3:
                x = self.forward_transition(i, x, train)
        return feats
