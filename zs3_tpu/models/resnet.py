"""Atrous ResNet backbones (DeepLab variant).

Functional parity target: reference zs3/modeling/backbone/resnet.py
(class ResNet, class Bottleneck, ResNet101) — ResNet-101 with the
stride->dilation rewrite in layer3/layer4 controlled by output_stride and
multi-grid (1, 2, 4) in layer4, returning (x: 2048ch @ os16/os8,
low_level: 256ch @ os4).  Rebuilt NHWC in flax; pretrained ImageNet
weights arrive via the local torch-state_dict converter
(zs3_tpu/utils/torch_convert.py), never a model-zoo download.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from zs3_tpu.models.layers import BatchNorm, Conv, max_pool_3x3_s2


class Bottleneck(nn.Module):
    """1x1 reduce -> 3x3 (stride/dilation) -> 1x1 expand(4x) + skip."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        bn = lambda name: BatchNorm(
            momentum=self.bn_momentum,
            epsilon=self.bn_epsilon,
            axis_name=self.bn_axis_name,
            dtype=self.dtype,
            name=name,
        )
        residual = x
        y = Conv(self.planes, kernel_size=1, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(bn("bn1")(y, train=train))
        y = Conv(
            self.planes,
            kernel_size=3,
            stride=self.stride,
            padding=self.dilation,
            dilation=self.dilation,
            dtype=self.dtype,
            name="conv2",
        )(y)
        y = nn.relu(bn("bn2")(y, train=train))
        y = Conv(self.planes * 4, kernel_size=1, dtype=self.dtype, name="conv3")(y)
        y = bn("bn3")(y, train=train)
        if self.downsample:
            residual = Conv(
                self.planes * 4,
                kernel_size=1,
                stride=self.stride,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            residual = bn("downsample_bn")(residual, train=train)
        return nn.relu(y + residual)


class ResNetAtrous(nn.Module):
    """ResNet-50/101 with atrous layer3/4 for dense prediction.

    output_stride=16: strides (1,2,2,1), dilations (1,1,1,2), grid scales
    the layer4 dilation by (1,2,4).  output_stride=8: strides (1,2,1,1),
    dilations (1,1,2,4).
    """

    layers: Sequence[int] = (3, 4, 23, 3)  # ResNet-101
    output_stride: int = 16
    multi_grid: Sequence[int] = (1, 2, 4)
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    stem_width: int = 64
    # Exact space-to-depth rewrite of the 7x7/s2 stem conv.  Measured
    # SLOWER on v5e (7.8 vs 5.9 ms/B64: the 3-channel phase rearrange is
    # itself lane-starved), so off by default — kept as a documented,
    # tested negative result (DESIGN.md §4).
    stem_s2d: bool = False
    # Rematerialize each bottleneck in the backward pass: trades ~30%
    # extra forward FLOPs for O(depth) less activation memory, unlocking
    # large-batch training at 513^2 (without it XLA's automatic remat
    # search explodes compile time past B16 on a 16GB chip).
    remat: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        if self.output_stride == 16:
            strides = (1, 2, 2, 1)
            dilations = (1, 1, 1, 2)
        elif self.output_stride == 8:
            strides = (1, 2, 1, 1)
            dilations = (1, 1, 2, 4)
        else:
            raise ValueError(f"output_stride must be 8 or 16, got {self.output_stride}")

        # Stem: 7x7/2 pad 3 -> BN -> ReLU -> maxpool 3x3/2 pad 1  (os4).
        # stem_s2d=True rewrites it as an exact space-to-depth 4x4 conv;
        # measured slower on v5e, so off by default (DESIGN.md §4).
        from zs3_tpu.models.layers import StemConv

        x = StemConv(
            features=self.stem_width,
            dtype=self.dtype,
            s2d=self.stem_s2d,
            name="stem_conv",
        )(x)
        x = BatchNorm(
            momentum=self.bn_momentum,
            epsilon=self.bn_epsilon,
            axis_name=self.bn_axis_name,
            dtype=self.dtype,
            name="stem_bn",
        )(x, train=train)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)

        low_level = None
        planes_per_stage = (64, 128, 256, 512)
        block_cls = (
            nn.remat(Bottleneck, static_argnums=(2,)) if self.remat else Bottleneck
        )
        for stage in range(4):
            planes = planes_per_stage[stage]
            for block in range(self.layers[stage]):
                first = block == 0
                if stage == 3:
                    # multi-grid in layer4 (reference: ResNet._make_MG_unit)
                    grid = self.multi_grid[min(block, len(self.multi_grid) - 1)]
                    dilation = dilations[stage] * grid
                else:
                    dilation = dilations[stage]
                x = block_cls(
                    planes=planes,
                    stride=strides[stage] if first else 1,
                    dilation=dilation,
                    downsample=first,  # channel change at every stage entry
                    bn_momentum=self.bn_momentum,
                    bn_epsilon=self.bn_epsilon,
                    bn_axis_name=self.bn_axis_name,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_block{block}",
                )(x, train)
            if stage == 0:
                low_level = x  # 256ch @ os4
        return x, low_level


def ResNet101(**kw) -> ResNetAtrous:
    return ResNetAtrous(layers=(3, 4, 23, 3), **kw)


def ResNet50(**kw) -> ResNetAtrous:
    return ResNetAtrous(layers=(3, 4, 6, 3), **kw)
