"""Import shims for the reference code at /root/reference.

The reference depends on `torchvision` (pose ResNet) and `timm`
(DropPath, trunc_normal_), neither of which is installed in this image.
For cross-implementation parity tests we only need:

  timm.layers.DropPath       — standard stochastic depth (identity in eval)
  timm.layers.trunc_normal_  — exists in torch core
  torchvision.models         — ResNet / BasicBlock / Bottleneck / resnet18..

so this module installs minimal, faithful stand-ins into sys.modules and
puts /root/reference on sys.path. The ResNet stand-in reproduces the
torchvision module layout exactly (conv1/bn1/layer{1..4}.{i}.conv{1,2}
/bn{1,2}/downsample.{0,1}/fc) so state_dict names match what the
reference's ResnetEncoder (resnet_encoder.py:367-409) produces.

Pretrained-weight loading is intentionally unsupported (no torchvision
weights in the image); tests construct everything with pretrained=False.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _install_timm():
    if "timm" in sys.modules:
        return
    import torch
    import torch.nn as nn

    class DropPath(nn.Module):
        """Stochastic depth per sample (timm semantics: scale by 1/keep)."""

        def __init__(self, drop_prob=None, scale_by_keep: bool = True):
            super().__init__()
            self.drop_prob = drop_prob or 0.0
            self.scale_by_keep = scale_by_keep

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = x.new_empty(shape).bernoulli_(keep)
            if keep > 0.0 and self.scale_by_keep:
                mask.div_(keep)
            return x * mask

        def extra_repr(self):
            return f"drop_prob={self.drop_prob:.3f}"

    timm = types.ModuleType("timm")
    layers = types.ModuleType("timm.layers")
    layers.DropPath = DropPath
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    timm.layers = layers
    sys.modules["timm"] = timm
    sys.modules["timm.layers"] = layers


def _install_torchvision():
    if "torchvision" in sys.modules:
        return
    import torch.nn as nn

    def conv3x3(in_planes, out_planes, stride=1, groups=1, dilation=1):
        return nn.Conv2d(in_planes, out_planes, 3, stride=stride,
                         padding=dilation, groups=groups, bias=False,
                         dilation=dilation)

    def conv1x1(in_planes, out_planes, stride=1):
        return nn.Conv2d(in_planes, out_planes, 1, stride=stride, bias=False)

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None,
                     groups=1, base_width=64, dilation=1, norm_layer=None):
            super().__init__()
            norm_layer = norm_layer or nn.BatchNorm2d
            self.conv1 = conv3x3(inplanes, planes, stride)
            self.bn1 = norm_layer(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = conv3x3(planes, planes)
            self.bn2 = norm_layer(planes)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None,
                     groups=1, base_width=64, dilation=1, norm_layer=None):
            super().__init__()
            norm_layer = norm_layer or nn.BatchNorm2d
            width = int(planes * (base_width / 64.0)) * groups
            self.conv1 = conv1x1(inplanes, width)
            self.bn1 = norm_layer(width)
            self.conv2 = conv3x3(width, width, stride, groups, dilation)
            self.bn2 = norm_layer(width)
            self.conv3 = conv1x1(width, planes * self.expansion)
            self.bn3 = norm_layer(planes * self.expansion)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet(nn.Module):
        def __init__(self, block, layers, num_classes=1000,
                     zero_init_residual=False, groups=1, width_per_group=64,
                     replace_stride_with_dilation=None, norm_layer=None):
            super().__init__()
            self._norm_layer = norm_layer or nn.BatchNorm2d
            self.inplanes = 64
            self.dilation = 1
            self.groups = groups
            self.base_width = width_per_group
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = self._norm_layer(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
            self.layer1 = self._make_layer(block, 64, layers[0])
            self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
            self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
            self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(512 * block.expansion, num_classes)
            for m in self.modules():
                if isinstance(m, nn.Conv2d):
                    nn.init.kaiming_normal_(m.weight, mode="fan_out",
                                            nonlinearity="relu")
                elif isinstance(m, nn.BatchNorm2d):
                    nn.init.constant_(m.weight, 1)
                    nn.init.constant_(m.bias, 0)

        def _make_layer(self, block, planes, blocks, stride=1, dilate=False):
            norm_layer = self._norm_layer
            downsample = None
            if stride != 1 or self.inplanes != planes * block.expansion:
                downsample = nn.Sequential(
                    conv1x1(self.inplanes, planes * block.expansion, stride),
                    norm_layer(planes * block.expansion),
                )
            layers = [block(self.inplanes, planes, stride, downsample,
                            self.groups, self.base_width, self.dilation,
                            norm_layer)]
            self.inplanes = planes * block.expansion
            for _ in range(1, blocks):
                layers.append(block(self.inplanes, planes, groups=self.groups,
                                    base_width=self.base_width,
                                    dilation=self.dilation,
                                    norm_layer=norm_layer))
            return nn.Sequential(*layers)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = self.avgpool(x).flatten(1)
            return self.fc(x)

    def _factory(block, layers):
        def make(pretrained=False, progress=True, **kwargs):
            assert not pretrained, "shim has no pretrained weights"
            return ResNet(block, layers, **kwargs)
        return make

    resnet_mod = types.ModuleType("torchvision.models.resnet")
    resnet_mod.BasicBlock = BasicBlock
    resnet_mod.Bottleneck = Bottleneck
    resnet_mod.ResNet = ResNet

    models = types.ModuleType("torchvision.models")
    models.ResNet = ResNet
    models.resnet = resnet_mod
    models.resnet18 = _factory(BasicBlock, [2, 2, 2, 2])
    models.resnet34 = _factory(BasicBlock, [3, 4, 6, 3])
    models.resnet50 = _factory(Bottleneck, [3, 4, 6, 3])
    models.resnet101 = _factory(Bottleneck, [3, 4, 23, 3])
    models.resnet152 = _factory(Bottleneck, [3, 8, 36, 3])

    tv = types.ModuleType("torchvision")
    tv.models = models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models.resnet"] = resnet_mod


def _install_stub(name, **attrs):
    if name in sys.modules:
        return
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    parent, _, child = name.rpartition(".")
    if parent and parent in sys.modules:
        setattr(sys.modules[parent], child, mod)


def _install_trainer_deps():
    """Stand-ins for trainer.py's module-level imports that are absent in
    this image and unused by the unbound loss methods we drive: wandb
    (logging), torchmetrics.Metric (DepthBins base), skimage.transform
    (dataset GT resize), torchvision.transforms (dataset aug)."""
    _install_stub("wandb", log=lambda *a, **k: None,
                  init=lambda *a, **k: None)

    if "torchmetrics" not in sys.modules:
        class Metric:
            full_state_update = False

            def __init__(self, *a, **k):
                pass

            def add_state(self, name, default=None, dist_reduce_fx=None):
                setattr(self, name, default)

        _install_stub("torchmetrics", Metric=Metric)

    _install_stub("skimage")
    _install_stub("skimage.transform", resize=None)
    sys.modules["skimage"].transform = sys.modules["skimage.transform"]

    # torchvision.transforms: datasets only touch it at runtime
    tv = sys.modules.get("torchvision")
    if tv is not None and not hasattr(tv, "transforms"):
        _install_stub("torchvision.transforms")
        tv.transforms = sys.modules["torchvision.transforms"]


def load_reference():
    """Install the shims and return the reference `ppeadepth.networks`."""
    _install_timm()
    _install_torchvision()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import ppeadepth.networks as ref_networks  # noqa: E402

    return ref_networks


def load_reference_trainer():
    """Install the shims and return the reference `ppeadepth.trainer`
    MODULE (not an instance — Trainer() needs accelerate/datasets/real
    data). Its loss/warp methods (generate_images_pred, compute_losses,
    compute_loss_masks, compute_matching_mask, compute_reprojection_loss;
    trainer.py:859-1160) are plain methods needing only opt /
    backproject_depth / project_3d / ssim, so tests drive them unbound on
    a SimpleNamespace."""
    load_reference()
    _install_trainer_deps()
    import ppeadepth.trainer as ref_trainer  # noqa: E402

    return ref_trainer
