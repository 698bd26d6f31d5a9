"""torchvision-compatible torch encoder definitions for parity tests.

torchvision is not installed in this environment, but the reference models
build their encoders from it (network/Bts.py:280-322 densenet taps,
network/FCRN.py:297-347 resnet, network/Eigen.py:71-90 vgg19_bn,
network/MiDaS.py:89-111 resnext101_32x8d via torch.hub, network/MyNet.py:
156-198 BTS-encoder copy). These are fresh implementations of those standard
(BSD-licensed) architectures with torchvision's exact module NAMING and
state_dict ordering, so the reference files instantiate unmodified and
their random weights stream through tools/convert_torch_ckpt into our Flax
models — the full-model numeric parity certificates of
tests/test_full_model_parity.py.

``install_fake_torchvision()`` registers a module named ``torchvision``
exposing the factories (plus ``torchvision.models.__dict__`` access used by
FCRN.py:305) and returns it.

Only eval-path fidelity matters here (the parity tests run .eval() with
randomized BN stats); no pretrained download, no training utilities.
"""

from __future__ import annotations

import sys
import types
from collections import OrderedDict

import torch
from torch import nn

# ---------------------------------------------------------------- DenseNet


class _DenseLayer(nn.Module):
    def __init__(self, in_ch: int, growth: int, bn_size: int):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(in_ch)
        self.relu1 = nn.ReLU(inplace=True)
        self.conv1 = nn.Conv2d(in_ch, bn_size * growth, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(bn_size * growth)
        self.relu2 = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(bn_size * growth, growth, 3, padding=1,
                               bias=False)

    def forward(self, x):
        out = self.conv1(self.relu1(self.norm1(x)))
        out = self.conv2(self.relu2(self.norm2(out)))
        return torch.cat([x, out], 1)


class _DenseBlock(nn.Module):
    def __init__(self, n_layers: int, in_ch: int, growth: int, bn_size: int):
        super().__init__()
        for i in range(n_layers):
            self.add_module(
                f"denselayer{i + 1}",
                _DenseLayer(in_ch + i * growth, growth, bn_size),
            )

    def forward(self, x):
        for layer in self.children():
            x = layer(x)
        return x


class _Transition(nn.Sequential):
    def __init__(self, in_ch: int, out_ch: int):
        super().__init__(OrderedDict([
            ("norm", nn.BatchNorm2d(in_ch)),
            ("relu", nn.ReLU(inplace=True)),
            ("conv", nn.Conv2d(in_ch, out_ch, 1, bias=False)),
            ("pool", nn.AvgPool2d(2, 2)),
        ]))


class DenseNet(nn.Module):
    """torchvision-named: .features with conv0/norm0/relu0/pool0,
    denseblock1..4, transition1..3, norm5 (the BTS tap names)."""

    def __init__(self, growth: int, block_config, num_init: int,
                 bn_size: int = 4):
        super().__init__()
        layers = OrderedDict([
            ("conv0", nn.Conv2d(3, num_init, 7, 2, 3, bias=False)),
            ("norm0", nn.BatchNorm2d(num_init)),
            ("relu0", nn.ReLU(inplace=True)),
            ("pool0", nn.MaxPool2d(3, 2, 1)),
        ])
        c = num_init
        for i, n in enumerate(block_config):
            layers[f"denseblock{i + 1}"] = _DenseBlock(n, c, growth, bn_size)
            c += n * growth
            if i < len(block_config) - 1:
                layers[f"transition{i + 1}"] = _Transition(c, c // 2)
                c //= 2
        layers["norm5"] = nn.BatchNorm2d(c)
        self.features = nn.Sequential(layers)

    def forward(self, x):
        return self.features(x)


def densenet121(pretrained=False, block_config=(6, 12, 24, 16)):
    return DenseNet(32, block_config, 64)


def densenet161(pretrained=False, block_config=(6, 12, 36, 24)):
    return DenseNet(48, block_config, 96)


# ------------------------------------------------------------------ ResNet


class Bottleneck(nn.Module):
    """torchvision ResNet V1.5 bottleneck (stride on the 3x3 conv)."""

    expansion = 4

    def __init__(self, in_ch: int, planes: int, stride: int = 1,
                 groups: int = 1, base_width: int = 64,
                 downsample: nn.Module | None = None):
        super().__init__()
        width = int(planes * (base_width / 64.0)) * groups
        self.conv1 = nn.Conv2d(in_ch, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, groups=groups,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, planes * self.expansion, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * self.expansion)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + identity)


class ResNet(nn.Module):
    """torchvision-named: conv1/bn1/relu/maxpool/layer1..4/avgpool/fc."""

    def __init__(self, block_counts, groups: int = 1,
                 width_per_group: int = 64, num_classes: int = 1000):
        super().__init__()
        self.groups, self.base_width = groups, width_per_group
        self.in_ch = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(64, block_counts[0], 1)
        self.layer2 = self._make_layer(128, block_counts[1], 2)
        self.layer3 = self._make_layer(256, block_counts[2], 2)
        self.layer4 = self._make_layer(512, block_counts[3], 2)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(512 * Bottleneck.expansion, num_classes)

    def _make_layer(self, planes: int, n_blocks: int, stride: int):
        downsample = None
        out_ch = planes * Bottleneck.expansion
        if stride != 1 or self.in_ch != out_ch:
            downsample = nn.Sequential(
                nn.Conv2d(self.in_ch, out_ch, 1, stride, bias=False),
                nn.BatchNorm2d(out_ch),
            )
        blocks = [Bottleneck(self.in_ch, planes, stride, self.groups,
                             self.base_width, downsample)]
        self.in_ch = out_ch
        for _ in range(1, n_blocks):
            blocks.append(Bottleneck(self.in_ch, planes, 1, self.groups,
                                     self.base_width))
        return nn.Sequential(*blocks)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.fc(torch.flatten(self.avgpool(x), 1))


def resnet50(pretrained=False, block_counts=(3, 4, 6, 3)):
    return ResNet(block_counts)


def resnet101(pretrained=False, block_counts=(3, 4, 23, 3)):
    return ResNet(block_counts)


def resnext50_32x4d(pretrained=False, block_counts=(3, 4, 6, 3)):
    return ResNet(block_counts, groups=32, width_per_group=4)


def resnext101_32x8d(pretrained=False, block_counts=(3, 4, 23, 3)):
    return ResNet(block_counts, groups=32, width_per_group=8)


# -------------------------------------------------------------------- VGG

_VGG19_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M")


def vgg19_bn(pretrained=False):
    """Module with torchvision's .features Sequential (conv/BN/ReLU per
    entry, MaxPool at 'M') — what Eigen consumes (network/Eigen.py:74)."""
    layers, c = [], 3
    for v in _VGG19_CFG:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(c, v, 3, padding=1), nn.BatchNorm2d(v),
                       nn.ReLU(inplace=True)]
            c = v
    m = nn.Module()
    m.features = nn.Sequential(*layers)
    return m


# ------------------------------------------------------------- installer


def install_fake_torchvision():
    """Registers/augments a ``torchvision`` module exposing the factories.
    Idempotent; fills in an empty stub another test may have installed."""
    tv = sys.modules.get("torchvision")
    if tv is None:
        tv = types.ModuleType("torchvision")
        sys.modules["torchvision"] = tv
    models = getattr(tv, "models", None)
    if models is None or not isinstance(models, types.ModuleType):
        models = types.ModuleType("torchvision.models")
        tv.models = models
        sys.modules["torchvision.models"] = models
    for f in (densenet121, densenet161, resnet50, resnet101,
              resnext50_32x4d, resnext101_32x8d, vgg19_bn):
        setattr(models, f.__name__, f)
    return tv
