"""Legacy ResNet18 cost-volume matching encoder + Monodepth2 decoder
(the original ManyDepth design, used by the reference's legacy eval
`eval_depth_ori.py`: ResnetEncoderMatching @ resnet_encoder.py:75-364 and
DepthDecoder @ depth_decoder.py:15-63).

Feature extraction = resnet stem + layer1 (1/4 res, C=64); the plane-sweep
cost volume is spliced before layer2; 5-level pyramid
[1/2, 1/4, 1/8, 1/16, 1/32]. The multiscale DepthDecoder emits
("disp", s) for s in scales, Monodepth2-style.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import cost_volume as CV
from ..ops.resize import upsample2x_nearest
from .blocks import ConvBlock, Conv3x3
from .resnet import BasicBlock

from .norm import BatchNorm as TorchBatchNorm  # torch-parity running_var


class ResnetEncoderMatching(nn.Module):
    num_layers: int = 18
    num_depth_bins: int = 96
    depth_binning: str = "linear"
    bin_chunk: int = 16

    @property
    def num_ch_enc(self) -> Sequence[int]:
        return [64, 64, 128, 256, 512]

    def setup(self):
        assert self.num_layers == 18, "legacy encoder supports resnet18"
        self.conv1 = nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                             use_bias=False)
        self.bn1 = TorchBatchNorm(momentum=0.9, epsilon=1e-5)
        blocks = {"layer1": (64, 1), "layer2": (128, 2),
                  "layer3": (256, 2), "layer4": (512, 2)}
        layers = {}
        for name, (width, stride) in blocks.items():
            layers[name] = [BasicBlock(width, stride), BasicBlock(width, 1)]
        self.layer1 = layers["layer1"]
        self.layer2 = layers["layer2"]
        self.layer3 = layers["layer3"]
        self.layer4 = layers["layer4"]
        self.reduce_conv = nn.Conv(64, (3, 3), padding=1)

    def _layer(self, blocks, x, train):
        for b in blocks:
            x = b(x, train)
        return x

    def feature_extraction(self, image, train: bool = False):
        """Returns (layer0 feats @1/2, layer1 feats @1/4)."""
        x = (image - 0.45) / 0.225
        x = nn.relu(self.bn1(self.conv1(x), use_running_average=not train))
        f0 = x
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        f1 = self._layer(self.layer1, x, train)
        return f0, f1

    def __call__(self, current_image, lookup_images, poses, K, invK,
                 min_depth_bin, max_depth_bin, train: bool = False):
        B, H, W, _ = current_image.shape
        F_ = lookup_images.shape[1]
        f0, cur = self.feature_extraction(current_image, train)

        lk0, lk = self.feature_extraction(
            lookup_images.reshape(B * F_, H, W, 3), train
        )
        lk = jax.lax.stop_gradient(lk).reshape(B, F_, *lk.shape[1:])

        bins = CV.compute_depth_bins(
            min_depth_bin, max_depth_bin, self.num_depth_bins,
            self.depth_binning,
        )
        cost, missing = CV.plane_sweep_cost_volume(
            jax.lax.stop_gradient(cur), lk, jax.lax.stop_gradient(poses),
            K, invK, bins, bin_chunk=self.bin_chunk,
        )
        conf = CV.confidence_mask(
            jax.lax.stop_gradient(cost), jax.lax.stop_gradient(missing)
        )
        lowest_cost = CV.lowest_cost_disparity(
            jax.lax.stop_gradient(cost), bins
        )
        cost_nhwc = jnp.transpose(cost, (0, 2, 3, 1)) * conf[..., None]
        x = nn.relu(
            self.reduce_conv(jnp.concatenate([cur, cost_nhwc], axis=-1))
        )
        feats = [f0, cur]
        x = self._layer(self.layer2, x, train)
        feats.append(x)
        x = self._layer(self.layer3, x, train)
        feats.append(x)
        x = self._layer(self.layer4, x, train)
        feats.append(x)
        return feats, lowest_cost, conf


class DepthDecoder(nn.Module):
    """Classic Monodepth2 decoder: 5 up-stages with skips, 4 disp scales
    (depth_decoder.py:15-63)."""

    num_ch_enc: Sequence[int] = (64, 64, 128, 256, 512)
    scales: Sequence[int] = (0, 1, 2, 3)
    num_output_channels: int = 1
    use_skips: bool = True

    def setup(self):
        num_ch_dec = [16, 32, 64, 128, 256]
        up0, up1 = {}, {}
        for i in range(4, -1, -1):
            ch_out = num_ch_dec[i]
            up0[i] = ConvBlock(ch_out)
            up1[i] = ConvBlock(ch_out)
        self.upconv_0 = [up0[i] for i in range(5)]
        self.upconv_1 = [up1[i] for i in range(5)]
        self.dispconvs = {s: Conv3x3(self.num_output_channels)
                          for s in self.scales}
        self._num_ch_dec = num_ch_dec

    def __call__(self, input_features, train: bool = False):
        outputs = {}
        x = input_features[-1]
        for i in range(4, -1, -1):
            x = self.upconv_0[i](x)
            x = upsample2x_nearest(x)
            if self.use_skips and i > 0:
                x = jnp.concatenate([x, input_features[i - 1]], -1)
            x = self.upconv_1[i](x)
            if i in self.scales:
                outputs[("disp", i)] = nn.sigmoid(self.dispconvs[i](x))
        return outputs
