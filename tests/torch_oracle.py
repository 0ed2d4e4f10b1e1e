"""Self-contained torch DeepLabv3+ oracle for golden parity tests.

torchvision is not installed in this image, so this module re-creates
the reference architecture in plain torch (CPU) with:

  * torchvision-compatible state_dict naming for the ResNet backbone
    (conv1/bn1/layerL.B.convN/downsample.{0,1}) so the converter path
    used for real ImageNet checkpoints is what gets tested;
  * the zs3_tpu canonical naming for ASPP/decoder blocks (aspp1..4,
    global_pool, project, low_proj, fuse1, fuse2, classifier).

Semantics follow the DeepLabv3+ reference: atrous stride->dilation
rewrite, multi-grid layer4, ASPP with image-level pooling branch,
align_corners=True bilinear upsampling, BN eval statistics.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, dilation=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(
            planes, planes, 3, stride=stride, padding=dilation,
            dilation=dilation, bias=False,
        )
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        residual = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            residual = self.downsample(x)
        return self.relu(out + residual)


class ResNetAtrous(nn.Module):
    def __init__(self, layers=(3, 4, 6, 3), output_stride=16,
                 multi_grid=(1, 2, 4)):
        super().__init__()
        if output_stride == 16:
            strides, dilations = (1, 2, 2, 1), (1, 1, 1, 2)
        elif output_stride == 8:
            strides, dilations = (1, 2, 1, 1), (1, 1, 2, 4)
        else:
            raise ValueError(output_stride)
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0], strides[0], dilations[0])
        self.layer2 = self._make_layer(128, layers[1], strides[1], dilations[1])
        self.layer3 = self._make_layer(256, layers[2], strides[2], dilations[2])
        self.layer4 = self._make_layer(
            512, layers[3], strides[3], dilations[3], multi_grid
        )

    def _make_layer(self, planes, blocks, stride, dilation, multi_grid=None):
        downsample = nn.Sequential(
            nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
            nn.BatchNorm2d(planes * 4),
        )
        grids = multi_grid or (1,) * blocks
        layers = [
            Bottleneck(
                self.inplanes, planes, stride,
                dilation * grids[0], downsample,
            )
        ]
        self.inplanes = planes * 4
        for i in range(1, blocks):
            g = grids[min(i, len(grids) - 1)]
            layers.append(Bottleneck(self.inplanes, planes, 1, dilation * g))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        low = self.layer1(x)
        x = self.layer4(self.layer3(self.layer2(low)))
        return x, low


class ConvBN(nn.Module):
    def __init__(self, cin, cout, k, padding=0, dilation=1):
        super().__init__()
        self.conv = nn.Conv2d(
            cin, cout, k, padding=padding, dilation=dilation, bias=False
        )
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TorchDeepLab(nn.Module):
    """backbone -> ASPP -> decoder with the ZS3 split classifier."""

    def __init__(self, num_classes=21, output_stride=16, layers=(3, 4, 6, 3)):
        super().__init__()
        self.backbone = ResNetAtrous(layers, output_stride)
        d = (1, 6, 12, 18) if output_stride == 16 else (1, 12, 24, 36)
        self.aspp1 = ConvBN(2048, 256, 1)
        self.aspp2 = ConvBN(2048, 256, 3, padding=d[1], dilation=d[1])
        self.aspp3 = ConvBN(2048, 256, 3, padding=d[2], dilation=d[2])
        self.aspp4 = ConvBN(2048, 256, 3, padding=d[3], dilation=d[3])
        self.global_pool = ConvBN(2048, 256, 1)
        self.project = ConvBN(256 * 5, 256, 1)
        self.low_proj = ConvBN(256, 48, 1)
        self.fuse1 = ConvBN(256 + 48, 256, 3, padding=1)
        self.fuse2 = ConvBN(256, 256, 3, padding=1)
        self.classifier = nn.Conv2d(256, num_classes, 1)

    def features(self, x):
        high, low = self.backbone(x)
        branches = [
            self.aspp1(high), self.aspp2(high), self.aspp3(high), self.aspp4(high)
        ]
        pooled = self.global_pool(
            F.adaptive_avg_pool2d(high, 1)
        ).expand(-1, -1, *high.shape[2:])
        y = self.project(torch.cat(branches + [pooled], dim=1))
        y = F.interpolate(
            y, size=low.shape[2:], mode="bilinear", align_corners=True
        )
        y = self.fuse1(torch.cat([y, self.low_proj(low)], dim=1))
        return self.fuse2(y)

    def forward(self, x):
        feats = self.features(x)
        logits = self.classifier(feats)
        return F.interpolate(
            logits, size=x.shape[2:], mode="bilinear", align_corners=True
        )
