"""Aligned Xception backbone (DeepLabv3+ modified).

Functional parity target: reference zs3/modeling/backbone/xception.py
(class AlignedXception, SeparableConv2d) — the DeepLabv3+ paper's
modified aligned Xception (arXiv:1802.02611 §4): entry flow with three
strided blocks, 16 middle-flow blocks, exit flow with separable convs to
2048 channels; all max-pools replaced by strided separable convs;
stride->dilation rewrite per output_stride (os16: entry block3 stride 2,
exit dilations (1, 2); os8: entry stride 1, middle dilation 2, exit
(2, 4)).  Low-level features: 128ch after entry block1 (os4).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from zs3_tpu.models.layers import BatchNorm, Conv


class SeparableConv(nn.Module):
    """depthwise 3x3 -> BN -> pointwise 1x1 (DeepLab variant: BN between)."""

    features: int
    stride: int = 1
    dilation: int = 1
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cin = x.shape[-1]
        x = Conv(
            cin,
            kernel_size=3,
            stride=self.stride,
            padding=self.dilation,
            dilation=self.dilation,
            feature_group_count=cin,
            dtype=self.dtype,
            name="depthwise",
        )(x)
        x = BatchNorm(
            momentum=self.bn_momentum,
            epsilon=self.bn_epsilon,
            axis_name=self.bn_axis_name,
            dtype=self.dtype,
            name="bn_depth",
        )(x, train=train)
        x = Conv(self.features, kernel_size=1, dtype=self.dtype, name="pointwise")(x)
        x = BatchNorm(
            momentum=self.bn_momentum,
            epsilon=self.bn_epsilon,
            axis_name=self.bn_axis_name,
            dtype=self.dtype,
            name="bn_point",
        )(x, train=train)
        return x


class XceptionBlock(nn.Module):
    planes: int
    reps: int
    stride: int = 1
    dilation: int = 1
    start_with_relu: bool = True
    grow_first: bool = True
    is_last: bool = False
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        bn_kw = dict(
            bn_momentum=self.bn_momentum,
            bn_epsilon=self.bn_epsilon,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
        )
        cin = x.shape[-1]
        needs_skip_conv = (self.planes != cin) or (self.stride != 1)
        skip = x
        if needs_skip_conv:
            skip = Conv(
                self.planes, kernel_size=1, stride=self.stride,
                dtype=self.dtype, name="skip_conv",
            )(x)
            skip = BatchNorm(
                momentum=self.bn_momentum,
                epsilon=self.bn_epsilon,
                axis_name=self.bn_axis_name,
                dtype=self.dtype,
                name="skip_bn",
            )(skip, train=train)

        # Unit plan mirrors the reference Block (zs3/modeling/backbone/
        # xception.py class Block [M recalled structure]): a grow-first
        # (or grow-last) rep chain at the block dilation, then an EXTRA
        # separable conv carrying the stride — or, for stride-1 blocks
        # marked is_last (entry block3 at os8, exit block20), an extra
        # stride-1 conv so the layer count is stride-independent.  The
        # extra unit uses dilation 1 (the reference constructs it with
        # SeparableConv2d's default dilation).
        units = []  # (out_channels, stride, dilation)
        width = self.planes if self.grow_first else cin
        if self.grow_first:
            units.append((self.planes, 1, self.dilation))
        for _ in range(self.reps - 1):
            units.append((width, 1, self.dilation))
        if not self.grow_first:
            units.append((self.planes, 1, self.dilation))
        if self.stride != 1:
            units.append((self.planes, self.stride, 1))
        elif self.is_last:
            units.append((self.planes, 1, 1))

        y = x
        for r, (out_ch, s, dil) in enumerate(units):
            if r > 0 or self.start_with_relu:
                y = nn.relu(y)
            y = SeparableConv(
                out_ch, stride=s, dilation=dil, **bn_kw, name=f"sep{r}"
            )(y, train=train)
        return y + skip


class AlignedXception(nn.Module):
    output_stride: int = 16
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        if self.output_stride == 16:
            entry3_stride, middle_dil, exit_dil = 2, 1, (1, 2)
        elif self.output_stride == 8:
            entry3_stride, middle_dil, exit_dil = 1, 2, (2, 4)
        else:
            raise ValueError(f"output_stride must be 8 or 16, got {self.output_stride}")
        bn_kw = dict(
            bn_momentum=self.bn_momentum,
            bn_epsilon=self.bn_epsilon,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
        )

        def bn(name):
            return BatchNorm(
                momentum=self.bn_momentum,
                epsilon=self.bn_epsilon,
                axis_name=self.bn_axis_name,
                dtype=self.dtype,
                name=name,
            )

        # Entry flow
        x = Conv(32, kernel_size=3, stride=2, padding=1, dtype=self.dtype,
                 name="conv1")(x)
        x = nn.relu(bn("bn1")(x, train=train))
        x = Conv(64, kernel_size=3, padding=1, dtype=self.dtype, name="conv2")(x)
        x = nn.relu(bn("bn2")(x, train=train))
        x = XceptionBlock(128, 2, stride=2, start_with_relu=False, **bn_kw,
                          name="block1")(x, train=train)
        x = nn.relu(x)
        low_level = x  # 128ch @ os4 (reference taps after the relu)
        x = XceptionBlock(256, 2, stride=2, **bn_kw, name="block2")(x, train=train)
        # block3 is is_last so its unit count is stride-independent
        # (at os8 its stride collapses to 1 and the extra conv remains).
        x = XceptionBlock(728, 2, stride=entry3_stride, is_last=True, **bn_kw,
                          name="block3")(x, train=train)
        # Middle flow: 16 blocks
        for i in range(4, 20):
            x = XceptionBlock(
                728, 3, dilation=middle_dil, **bn_kw, name=f"block{i}"
            )(x, train=train)
        # Exit flow
        x = XceptionBlock(
            1024, 2, stride=1, dilation=exit_dil[0], grow_first=False,
            is_last=True, **bn_kw, name="block20",
        )(x, train=train)
        x = nn.relu(x)
        x = SeparableConv(1536, dilation=exit_dil[1], **bn_kw, name="conv3")(
            x, train=train
        )
        x = nn.relu(x)
        x = SeparableConv(1536, dilation=exit_dil[1], **bn_kw, name="conv4")(
            x, train=train
        )
        x = nn.relu(x)
        x = SeparableConv(2048, dilation=exit_dil[1], **bn_kw, name="conv5")(
            x, train=train
        )
        x = nn.relu(x)
        return x, low_level
