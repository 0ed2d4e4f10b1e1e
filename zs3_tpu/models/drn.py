"""DRN-D-54 backbone (dilated residual network).

Functional parity target: reference zs3/modeling/backbone/drn.py
(drn_d_54) — the fyu/drn 'D' architecture: plain conv levels 1-2 and
7-8, Bottleneck residual levels 3-6, layers (1, 1, 3, 4, 6, 3, 1, 1),
channels (16, 32, 64, 128, 256, 512, 512, 512); strides 1,1,2,2 then
dilation 2,4 in levels 5-6 and 2,1 in the conv levels 7-8.  Natively
output_stride 8 (the DeepLab assembly uses os8 ASPP rates for DRN);
low-level features: 256ch after level 3 (os4).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from zs3_tpu.models.layers import BatchNorm, Conv
from zs3_tpu.models.resnet import Bottleneck


class _ConvLevel(nn.Module):
    """Plain conv3x3+BN+ReLU stack (DRN arch-D levels 1, 2, 7, 8)."""

    features: int
    convs: int = 1
    stride: int = 1
    dilation: int = 1
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i in range(self.convs):
            x = Conv(
                self.features,
                kernel_size=3,
                stride=self.stride if i == 0 else 1,
                padding=self.dilation,
                dilation=self.dilation,
                dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            x = BatchNorm(
                momentum=self.bn_momentum,
                epsilon=self.bn_epsilon,
                axis_name=self.bn_axis_name,
                dtype=self.dtype,
                name=f"bn{i}",
            )(x, train=train)
            x = nn.relu(x)
        return x


class DRN54(nn.Module):
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        bn_kw = dict(
            bn_momentum=self.bn_momentum,
            bn_epsilon=self.bn_epsilon,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
        )
        # level 0: 7x7 stem, stride 1 (DRN keeps full resolution here)
        x = Conv(16, kernel_size=7, stride=1, padding=3, dtype=self.dtype,
                 name="stem_conv")(x)
        x = BatchNorm(momentum=self.bn_momentum, epsilon=self.bn_epsilon,
                      axis_name=self.bn_axis_name, dtype=self.dtype,
                      name="stem_bn")(x, train=train)
        x = nn.relu(x)
        # levels 1-2: conv levels
        x = _ConvLevel(16, convs=1, stride=1, **bn_kw, name="level1")(x, train=train)
        x = _ConvLevel(32, convs=1, stride=2, **bn_kw, name="level2")(x, train=train)
        # levels 3-6: Bottleneck residual stages
        plan = (
            ("level3", 64, 3, 2, 1),   # -> 256ch @ os4
            ("level4", 128, 4, 2, 1),  # -> 512ch @ os8
            ("level5", 256, 6, 1, 2),  # -> 1024ch, dilation 2
            ("level6", 512, 3, 1, 4),  # -> 2048ch, dilation 4
        )
        low_level = None
        for name, planes, blocks, stride, dilation in plan:
            for b in range(blocks):
                x = Bottleneck(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    dilation=dilation,
                    downsample=b == 0,
                    **bn_kw,
                    name=f"{name}_block{b}",
                )(x, train=train)
            if name == "level3":
                low_level = x  # 256ch @ os4
        # levels 7-8: conv levels that wind dilation back down
        x = _ConvLevel(512, convs=1, dilation=2, **bn_kw, name="level7")(
            x, train=train
        )
        x = _ConvLevel(512, convs=1, dilation=1, **bn_kw, name="level8")(
            x, train=train
        )
        return x, low_level
