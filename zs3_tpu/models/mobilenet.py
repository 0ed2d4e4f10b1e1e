"""MobileNetV2 backbone (lightweight option).

Functional parity target: reference zs3/modeling/backbone/mobilenet.py
(class MobileNetV2, InvertedResidual) — width 1.0 MobileNetV2 with the
stride->dilation rewrite after the configured output_stride is reached.
Low-level features: 24ch after the second stage (os4); final features:
320ch (the ASPP input conv adapts to any width).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from zs3_tpu.models.layers import BatchNorm, Conv

# (expansion t, channels c, repeats n, stride s) — MobileNetV2 table 2.
_CFG = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


class InvertedResidual(nn.Module):
    features: int
    stride: int = 1
    expand: int = 6
    dilation: int = 1
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        def bn(name):
            return BatchNorm(
                momentum=self.bn_momentum,
                epsilon=self.bn_epsilon,
                axis_name=self.bn_axis_name,
                dtype=self.dtype,
                name=name,
            )

        cin = x.shape[-1]
        hidden = cin * self.expand
        use_res = self.stride == 1 and cin == self.features
        y = x
        if self.expand != 1:
            y = Conv(hidden, kernel_size=1, dtype=self.dtype, name="expand_conv")(y)
            y = nn.relu6(bn("expand_bn")(y, train=train))
        y = Conv(
            hidden,
            kernel_size=3,
            stride=self.stride,
            padding=self.dilation,
            dilation=self.dilation,
            feature_group_count=hidden,
            dtype=self.dtype,
            name="depthwise",
        )(y)
        y = nn.relu6(bn("depthwise_bn")(y, train=train))
        y = Conv(self.features, kernel_size=1, dtype=self.dtype, name="project_conv")(y)
        y = bn("project_bn")(y, train=train)
        return x + y if use_res else y


class MobileNetV2Backbone(nn.Module):
    output_stride: int = 16
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
        x = Conv(32, kernel_size=3, stride=2, padding=1, dtype=self.dtype,
                 name="stem_conv")(x)
        x = BatchNorm(momentum=self.bn_momentum, epsilon=self.bn_epsilon,
                      axis_name=self.bn_axis_name, dtype=self.dtype,
                      name="stem_bn")(x, train=train)
        x = nn.relu6(x)

        # Stride->dilation rewrite, per stage, with the converting stage
        # keeping the PRE-multiplication rate (reference mobilenet.py:
        # `stride=1; dilation=rate; rate *= s` once current_stride hits
        # output_stride).  That is also the correct atrous conversion:
        # the converting convs still read the pre-stride grid, so only
        # LATER stages (which now see a 2x finer grid) need the doubled
        # taps.
        current_stride = 2
        rate = 1
        low_level = None
        block_idx = 0
        for stage, (t, c, n, s) in enumerate(_CFG):
            if current_stride >= self.output_stride:
                stage_stride = 1
                dilation = rate
                rate *= s
            else:
                stage_stride = s
                dilation = 1
                current_stride *= s
            for i in range(n):
                x = InvertedResidual(
                    features=c,
                    stride=stage_stride if i == 0 else 1,
                    expand=t,
                    dilation=dilation,
                    **bn_kw,
                    name=f"block{block_idx}",
                )(x, train=train)
                block_idx += 1
            if stage == 1:
                low_level = x  # 24ch @ os4
        return x, low_level
