"""ResNet-18/50 feature encoder for pose estimation (flax, NHWC).

Structural clone of torchvision resnet18/50 as used by the reference's
ResnetEncoder (resnet_encoder.py:367-409): 5-level feature pyramid
[relu(conv1), layer1(after maxpool), layer2, layer3, layer4], input
normalised (x - 0.45) / 0.225, and a `num_input_images`-wide stem for the
2-frame pose input (resnet_encoder.py:26-72). Weight layout maps 1:1 to
torchvision for checkpoint import.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from .norm import BatchNorm as TorchBatchNorm  # torch-parity running_var


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, name="conv1",
        )(x)
        out = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="bn1",
        )(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.features, (3, 3), padding=1, use_bias=False, name="conv2"
        )(out)
        out = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="bn2",
        )(out)
        if self.stride != 1 or identity.shape[-1] != self.features:
            identity = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample_conv",
            )(identity)
            identity = TorchBatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name="downsample_bn",
            )(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out_ch = self.features * 4

        def bn(name):
            return TorchBatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=name,
            )

        out = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, name="conv2",
        )(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(out)
        out = bn("bn3")(out)
        if self.stride != 1 or identity.shape[-1] != out_ch:
            identity = nn.Conv(
                out_ch, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample_conv",
            )(identity)
            identity = bn("downsample_bn")(identity)
        return nn.relu(out + identity)


_LAYERS = {18: (2, 2, 2, 2), 50: (3, 4, 6, 3)}


class ResnetEncoder(nn.Module):
    num_layers: int = 18
    num_input_images: int = 1

    @property
    def num_ch_enc(self) -> Sequence[int]:
        ch = [64, 64, 128, 256, 512]
        if self.num_layers > 34:
            return [64] + [c * 4 for c in ch[1:]]
        return ch

    def setup(self):
        assert self.num_layers in _LAYERS, self.num_layers
        blocks = _LAYERS[self.num_layers]
        block_cls = BasicBlock if self.num_layers <= 34 else Bottleneck
        self.conv1 = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=3, use_bias=False
        )
        self.bn1 = TorchBatchNorm(momentum=0.9, epsilon=1e-5)
        layers = []
        for i, (width, n) in enumerate(zip((64, 128, 256, 512), blocks)):
            stage = []
            for j in range(n):
                stride = 2 if (i > 0 and j == 0) else 1
                stage.append(block_cls(width, stride))
            layers.append(stage)
        self.layer1, self.layer2, self.layer3, self.layer4 = layers

    def __call__(self, x, train: bool = False):
        """x: [B, H, W, 3*num_input_images] in [0, 1].
        Returns the 5-level feature list."""
        x = (x - 0.45) / 0.225
        feats = []
        x = self.conv1(x)
        x = self.bn1(x, use_running_average=not train)
        x = nn.relu(x)
        feats.append(x)
        x = nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        )
        for stage in (self.layer1, self.layer2, self.layer3, self.layer4):
            for blk in stage:
                x = blk(x, train)
            feats.append(x)
        return feats
