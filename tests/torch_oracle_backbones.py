"""Torch oracles for the non-resnet backbones (golden parity).

Each class mirrors the corresponding zs3_tpu flax backbone's compute
exactly while using the upstream checkpoint naming the converters in
zs3_tpu/utils/torch_convert.py expect:

  * TorchAlignedXception — reference zs3/modeling/backbone/xception.py
    naming (conv1/bn1/conv2/bn2, blockN.rep Sequential of
    [ReLU, SeparableConv2d(conv1,bn,pointwise), BatchNorm2d],
    blockN.skip/skipbn, conv3..5 + bn3..5);
  * TorchMobileNetV2 — flat `features.N.conv.K` Sequential naming
    (jfzhang95-lineage mobilenet_v2 checkpoints);
  * TorchDRN54 — fyu/drn arch-D naming (layer0..layer8).

Padding note: the upstream SeparableConv2d pads via fixed_padding with
conv padding=0; padding=dilation for a 3x3 kernel is numerically
identical for stride 1 and for stride 2 on odd spatial sizes (which all
parity inputs use).
"""

from __future__ import annotations

import torch
import torch.nn as nn


# --- AlignedXception -------------------------------------------------------
class SeparableConv2d(nn.Module):
    def __init__(self, cin, cout, stride=1, dilation=1):
        super().__init__()
        self.conv1 = nn.Conv2d(
            cin, cin, 3, stride=stride, padding=dilation, dilation=dilation,
            groups=cin, bias=False,
        )
        self.bn = nn.BatchNorm2d(cin)
        self.pointwise = nn.Conv2d(cin, cout, 1, bias=False)

    def forward(self, x):
        return self.pointwise(self.bn(self.conv1(x)))


class XBlock(nn.Module):
    def __init__(self, inplanes, planes, reps, stride=1, dilation=1,
                 start_with_relu=True, grow_first=True, is_last=False):
        super().__init__()
        if planes != inplanes or stride != 1:
            self.skip = nn.Conv2d(inplanes, planes, 1, stride=stride, bias=False)
            self.skipbn = nn.BatchNorm2d(planes)
        else:
            self.skip = None
        rep = []
        filters = inplanes
        if grow_first:
            rep += [nn.ReLU(inplace=False),
                    SeparableConv2d(inplanes, planes, 1, dilation),
                    nn.BatchNorm2d(planes)]
            filters = planes
        for _ in range(reps - 1):
            rep += [nn.ReLU(inplace=False),
                    SeparableConv2d(filters, filters, 1, dilation),
                    nn.BatchNorm2d(filters)]
        if not grow_first:
            rep += [nn.ReLU(inplace=False),
                    SeparableConv2d(inplanes, planes, 1, dilation),
                    nn.BatchNorm2d(planes)]
        if stride != 1:
            rep += [nn.ReLU(inplace=False),
                    SeparableConv2d(planes, planes, stride, 1),
                    nn.BatchNorm2d(planes)]
        elif is_last:
            rep += [nn.ReLU(inplace=False),
                    SeparableConv2d(planes, planes, 1, 1),
                    nn.BatchNorm2d(planes)]
        if not start_with_relu:
            rep = rep[1:]
        self.rep = nn.Sequential(*rep)

    def forward(self, x):
        out = self.rep(x)
        skip = x if self.skip is None else self.skipbn(self.skip(x))
        return out + skip


class TorchAlignedXception(nn.Module):
    def __init__(self, output_stride=16):
        super().__init__()
        if output_stride == 16:
            entry3_stride, middle_dil, exit_dil = 2, 1, (1, 2)
        elif output_stride == 8:
            entry3_stride, middle_dil, exit_dil = 1, 2, (2, 4)
        else:
            raise ValueError(output_stride)
        self.relu = nn.ReLU(inplace=False)
        self.conv1 = nn.Conv2d(3, 32, 3, stride=2, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(32)
        self.conv2 = nn.Conv2d(32, 64, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(64)
        self.block1 = XBlock(64, 128, 2, stride=2, start_with_relu=False)
        self.block2 = XBlock(128, 256, 2, stride=2)
        self.block3 = XBlock(256, 728, 2, stride=entry3_stride, is_last=True)
        for i in range(4, 20):
            setattr(self, f"block{i}", XBlock(728, 728, 3, dilation=middle_dil))
        self.block20 = XBlock(728, 1024, 2, stride=1, dilation=exit_dil[0],
                              grow_first=False, is_last=True)
        self.conv3 = SeparableConv2d(1024, 1536, 1, exit_dil[1])
        self.bn3 = nn.BatchNorm2d(1536)
        self.conv4 = SeparableConv2d(1536, 1536, 1, exit_dil[1])
        self.bn4 = nn.BatchNorm2d(1536)
        self.conv5 = SeparableConv2d(1536, 2048, 1, exit_dil[1])
        self.bn5 = nn.BatchNorm2d(2048)

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.relu(self.bn2(self.conv2(x)))
        x = self.block1(x)
        x = self.relu(x)
        low = x
        x = self.block2(x)
        x = self.block3(x)
        for i in range(4, 20):
            x = getattr(self, f"block{i}")(x)
        x = self.block20(x)
        x = self.relu(x)
        x = self.relu(self.bn3(self.conv3(x)))
        x = self.relu(self.bn4(self.conv4(x)))
        x = self.relu(self.bn5(self.conv5(x)))
        return x, low


# --- MobileNetV2 -----------------------------------------------------------
_MOBILENET_CFG = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


class TorchInvertedResidual(nn.Module):
    def __init__(self, cin, cout, stride, expand, dilation=1):
        super().__init__()
        hidden = cin * expand
        self.use_res = stride == 1 and cin == cout
        layers = []
        if expand != 1:
            layers += [nn.Conv2d(cin, hidden, 1, bias=False),
                       nn.BatchNorm2d(hidden), nn.ReLU6(inplace=False)]
        layers += [
            nn.Conv2d(hidden, hidden, 3, stride=stride, padding=dilation,
                      dilation=dilation, groups=hidden, bias=False),
            nn.BatchNorm2d(hidden), nn.ReLU6(inplace=False),
            nn.Conv2d(hidden, cout, 1, bias=False),
            nn.BatchNorm2d(cout),
        ]
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        y = self.conv(x)
        return x + y if self.use_res else y


class TorchMobileNetV2(nn.Module):
    def __init__(self, output_stride=16):
        super().__init__()
        features = [nn.Sequential(
            nn.Conv2d(3, 32, 3, stride=2, padding=1, bias=False),
            nn.BatchNorm2d(32), nn.ReLU6(inplace=False),
        )]
        cin = 32
        current_stride = 2
        rate = 1
        self.low_idx = None
        # Per-stage rewrite with the converting stage at the old rate
        # (reference mobilenet.py: stride=1; dilation=rate; rate *= s).
        for stage, (t, c, n, s) in enumerate(_MOBILENET_CFG):
            if current_stride >= output_stride:
                stage_stride, dilation = 1, rate
                rate *= s
            else:
                stage_stride, dilation = s, 1
                current_stride *= s
            for i in range(n):
                stride = stage_stride if i == 0 else 1
                features.append(TorchInvertedResidual(cin, c, stride, t, dilation))
                cin = c
            if stage == 1:
                self.low_idx = len(features) - 1
        self.features = nn.Sequential(*features)

    def forward(self, x):
        low = None
        for i, m in enumerate(self.features):
            x = m(x)
            if i == self.low_idx:
                low = x
        return x, low


# --- DRN-D-54 ----------------------------------------------------------------
from tests.torch_oracle import Bottleneck  # torchvision-style naming


def _conv_level(cin, cout, convs=1, stride=1, dilation=1):
    layers = []
    for i in range(convs):
        layers += [
            nn.Conv2d(cin if i == 0 else cout, cout, 3,
                      stride=stride if i == 0 else 1,
                      padding=dilation, dilation=dilation, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU(inplace=False),
        ]
    return nn.Sequential(*layers)


class TorchDRN54(nn.Module):
    def __init__(self):
        super().__init__()
        self.layer0 = nn.Sequential(
            nn.Conv2d(3, 16, 7, stride=1, padding=3, bias=False),
            nn.BatchNorm2d(16), nn.ReLU(inplace=False),
        )
        self.layer1 = _conv_level(16, 16)
        self.layer2 = _conv_level(16, 32, stride=2)
        self.layer3 = self._res_level(32, 64, 3, stride=2)
        self.layer4 = self._res_level(256, 128, 4, stride=2)
        self.layer5 = self._res_level(512, 256, 6, dilation=2)
        self.layer6 = self._res_level(1024, 512, 3, dilation=4)
        self.layer7 = _conv_level(2048, 512, dilation=2)
        self.layer8 = _conv_level(512, 512, dilation=1)

    @staticmethod
    def _res_level(cin, planes, blocks, stride=1, dilation=1):
        downsample = nn.Sequential(
            nn.Conv2d(cin, planes * 4, 1, stride=stride, bias=False),
            nn.BatchNorm2d(planes * 4),
        )
        layers = [Bottleneck(cin, planes, stride, dilation, downsample)]
        for _ in range(1, blocks):
            layers.append(Bottleneck(planes * 4, planes, 1, dilation))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.layer0(x)
        x = self.layer1(x)
        x = self.layer2(x)
        low = self.layer3(x)
        x = self.layer4(low)
        x = self.layer5(x)
        x = self.layer6(x)
        x = self.layer7(x)
        x = self.layer8(x)
        return x, low
