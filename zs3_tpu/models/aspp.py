"""ASPP — Atrous Spatial Pyramid Pooling.

Functional parity target: reference zs3/modeling/aspp.py (class ASPP,
class _ASPPModule, build_aspp).  Four parallel conv branches (1x1 + three
3x3 atrous at dilations [6,12,18] for os16 / [12,24,36] for os8) plus an
image-level global-average-pool branch; concat -> 1x1 to 256ch -> BN ->
ReLU -> dropout(0.5).  The pooled branch's "upsample" is a pure broadcast
(bilinear of a 1x1 map), so it is written as such instead of a resize.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from zs3_tpu.models.layers import ConvBN, global_avg_pool


class ASPP(nn.Module):
    output_stride: int = 16
    features: int = 256
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    bn_axis_name: Optional[str] = None
    dropout: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, deterministic: bool = True
    ) -> jax.Array:
        if self.output_stride == 16:
            dilations = (1, 6, 12, 18)
        elif self.output_stride == 8:
            dilations = (1, 12, 24, 36)
        else:
            raise ValueError(f"output_stride must be 8 or 16, got {self.output_stride}")

        bn_kw = dict(
            bn_momentum=self.bn_momentum,
            bn_epsilon=self.bn_epsilon,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
        )
        branches = []
        for i, d in enumerate(dilations):
            k = 1 if d == 1 else 3
            branches.append(
                ConvBN(
                    self.features,
                    kernel_size=k,
                    padding=0 if k == 1 else d,
                    dilation=d,
                    **bn_kw,
                    name=f"aspp{i + 1}",
                )(x, train=train)
            )
        # Image-level branch: GAP -> 1x1 conv -> BN -> ReLU -> broadcast.
        pooled = global_avg_pool(x)
        pooled = ConvBN(self.features, kernel_size=1, **bn_kw, name="global_pool")(
            pooled, train=train
        )
        branches.append(jnp.broadcast_to(pooled, branches[0].shape))

        y = jnp.concatenate(branches, axis=-1)
        y = ConvBN(self.features, kernel_size=1, **bn_kw, name="project")(
            y, train=train
        )
        if self.dropout:
            y = nn.Dropout(rate=0.5, deterministic=deterministic)(y)
        return y
