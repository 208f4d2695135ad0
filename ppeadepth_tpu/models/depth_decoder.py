"""DepthDecoderV2 — U-Net depth decoder with stage-2 decoder adapters.

Mirrors depth_decoder_v2.py:83-245: five up-stages (the first four consume
encoder skips feats[2-i], the fifth is skip-free), nearest 2x upsampling,
reflection-padded ConvBlocks, a single Conv3x3+sigmoid disparity head at
full resolution (the reference builds one disp head — sclm=0 path).

Stage-2 ("dc") mode attaches a zero-initialised decoder adapter whose input
depends on `dec_id` (design 1 — the shipped one — consumes
concat(feats[0], nearest-8x(feats[3]))) and injects it into the decoder
tail through a zero-init ConvTranspose ("deconv_adpt"); because both are
zero-init the stage-2 model starts exactly at its stage-1 behavior
(repdepth.py:175-262).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .adapters import DecoderAdapter, UpAdapter
from .blocks import Conv3x3, ConvBlock
from ..ops.resize import resize_nearest, upsample2x_nearest


class ConvTranspose3x3s2(nn.Module):
    """torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1) equivalent:
    2x-dilate the input, pad (1, 2) on each spatial dim, correlate with the
    spatially-flipped kernel. Zero-initialised (both deconv_adpt uses are,
    repdepth.py:246-250)."""

    features: int

    @nn.compact
    def __call__(self, x):
        k = self.param(
            "kernel", nn.initializers.zeros, (3, 3, x.shape[-1], self.features)
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jax.lax.conv_general_dilated(
            x,
            k[::-1, ::-1, :, :],
            window_strides=(1, 1),
            padding=((1, 2), (1, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b


class DepthDecoderV2(nn.Module):
    num_ch_enc: Sequence[int]
    num_output_channels: int = 1
    dc: bool = False
    dec_id: int = 1
    dec_ratio: float = 0.25
    dtype: object = None

    def setup(self):
        ch = list(self.num_ch_enc)
        base_ch = ch[0] // 4
        self.ch_in_disp = [base_ch * 2 ** i for i in range(4)]
        up0, up1 = [], []
        for i in range(3, -1, -1):
            ch_in = ch[i]
            ch_out = ch[i] // 2
            up0.append(ConvBlock(ch_out, self.dtype))
            up1.append(ConvBlock(ch_out, self.dtype))
        up0.append(ConvBlock(base_ch, self.dtype))
        up1.append(ConvBlock(base_ch, self.dtype))
        self.upconvs_0 = up0
        self.upconvs_1 = up1
        self.disp_conv = Conv3x3(self.num_output_channels)  # head in f32

        if self.dc:
            did = self.dec_id
            if did in (1, 5, 6, 7):
                self.adapter = DecoderAdapter(self.ch_in_disp[0], self.dec_ratio)
                self.deconv_adpt = ConvTranspose3x3s2(self.ch_in_disp[0])
            elif did == 2:
                self.adapter = DecoderAdapter(self.ch_in_disp[0])
                self.deconv_adpt = ConvTranspose3x3s2(self.ch_in_disp[0])
            elif did == 3:
                self.adapter = DecoderAdapter(self.ch_in_disp[0])
                self.deconv_adpt = ConvTranspose3x3s2(self.ch_in_disp[0])
            elif did == 4:
                self.adapter = DecoderAdapter(self.ch_in_disp[0])
                self.deconv_adpt = ConvTranspose3x3s2(self.ch_in_disp[0])
                self.deconv_adpt2 = ConvTranspose3x3s2(self.ch_in_disp[0])
            elif did == 8:
                self.adapter = DecoderAdapter(self.ch_in_disp[0])
            elif did == 10:
                ups = []
                for i in range(3):
                    ups.append(UpAdapter(self.num_ch_enc[2 - i]))
                ups.append(UpAdapter(self.num_ch_enc[0] // 2))
                self.up_adapters = ups

    def __call__(self, input_features, train: bool = False):
        x = input_features[-1]

        adpt_out = None
        if self.dc and self.dec_id in (1, 2, 3, 4, 5, 6, 7, 8):
            H, W = x.shape[1], x.shape[2]
            x_up = resize_nearest(x, 8 * H, 8 * W)
            if self.dec_id in (1, 4, 5, 6, 7):
                adpt_in = jnp.concatenate([input_features[0], x_up], -1)
                adpt_out = self.deconv_adpt(self.adapter(adpt_in))
            elif self.dec_id == 2:
                f2 = input_features[-2]
                x_2 = resize_nearest(f2, 4 * f2.shape[1], 4 * f2.shape[2])
                f1 = input_features[1]
                x_1 = resize_nearest(f1, 2 * f1.shape[1], 2 * f1.shape[2])
                adpt_in = jnp.concatenate(
                    [input_features[0], x_up, x_2, x_1], -1
                )
                adpt_out = self.deconv_adpt(self.adapter(adpt_in))
            elif self.dec_id == 3:
                adpt_out = self.deconv_adpt(self.adapter(x_up))
            elif self.dec_id == 8:
                adpt_in = jnp.concatenate([input_features[0], x_up], -1)
                adpt_out = upsample2x_nearest(self.adapter(adpt_in))

        for i in range(4):
            if self.dc and self.dec_id >= 10:
                adpt_out = self.up_adapters[i](x)
            x = self.upconvs_0[i](x)
            x = upsample2x_nearest(x)
            if i < 3:
                x = jnp.concatenate([x, input_features[2 - i]], -1)
            x = self.upconvs_1[i](x)
            if self.dc and self.dec_id >= 10:
                x = x + 0.01 * adpt_out

        x = upsample2x_nearest(self.upconvs_0[4](x))
        x = self.upconvs_1[4](x)

        if self.dc and adpt_out is not None and self.dec_id < 10:
            if self.dec_id in (1, 2, 3, 5, 6, 7, 8):
                adpt_out = upsample2x_nearest(adpt_out)
                x = x + adpt_out
            elif self.dec_id == 4:
                x = x + self.deconv_adpt2(adpt_out)

        disp = nn.sigmoid(self.disp_conv(x))
        return {("disp", 0): disp}
