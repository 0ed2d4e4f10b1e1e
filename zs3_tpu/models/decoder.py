"""DeepLabv3+ decoder with first-class feature/classifier split.

Functional parity target: reference zs3/modeling/decoder.py (class
Decoder, build_decoder).  Low-level features (256ch @ os4) project via
1x1 -> 48ch; ASPP output upsamples x4 (align_corners bilinear) and
concatenates; two 3x3 convs (+dropout 0.5/0.1) produce the 256-d pixel
embedding — the ZS3 feature tap — and a separate 1x1 conv classifies.

The split is the core ZS3 modification (reference: deeplab.py
forward_before_class_prediction / forward_class_prediction): the GMMN
generator imitates the 256-d embedding and only the classifier retrains
on synthesized features.  Here `features()` and `classify()` are separate
module methods from day one (flax setup-style so both are reachable via
`apply(..., method=...)`).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from zs3_tpu.models.layers import Conv, ConvBN
from zs3_tpu.ops.resize import resize_bilinear


class Decoder(nn.Module):
    num_classes: int = 21
    feature_dim: int = 256
    low_level_dim: int = 48
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    bn_axis_name: Optional[str] = None
    dropout: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        bn_kw = dict(
            bn_momentum=self.bn_momentum,
            bn_epsilon=self.bn_epsilon,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
        )
        self.low_proj = ConvBN(
            self.low_level_dim, kernel_size=1, **bn_kw, name="low_proj"
        )
        self.fuse1 = ConvBN(
            self.feature_dim, kernel_size=3, padding=1, **bn_kw, name="fuse1"
        )
        self.fuse2 = ConvBN(
            self.feature_dim, kernel_size=3, padding=1, **bn_kw, name="fuse2"
        )
        self.drop1 = nn.Dropout(rate=0.5)
        self.drop2 = nn.Dropout(rate=0.1)
        self.classifier = Conv(
            self.num_classes,
            kernel_size=1,
            use_bias=True,
            dtype=self.dtype,
            name="classifier",
        )

    def features(
        self,
        aspp_out: jax.Array,
        low_level: jax.Array,
        train: bool = False,
        deterministic: bool = True,
    ) -> jax.Array:
        """256-d pixel embedding at the low-level (os4) grid."""
        low = self.low_proj(low_level, train=train)
        up = resize_bilinear(aspp_out, low.shape[1:3], align_corners=True)
        y = jnp.concatenate([up, low], axis=-1)
        y = self.fuse1(y, train=train)
        if self.dropout:
            y = self.drop1(y, deterministic=deterministic)
        y = self.fuse2(y, train=train)
        if self.dropout:
            y = self.drop2(y, deterministic=deterministic)
        return y

    def classify(self, feats: jax.Array) -> jax.Array:
        """The split 1x1 classifier; retrainable in isolation."""
        return self.classifier(feats)

    def __call__(
        self,
        aspp_out: jax.Array,
        low_level: jax.Array,
        train: bool = False,
        deterministic: bool = True,
    ) -> jax.Array:
        feats = self.features(
            aspp_out, low_level, train=train, deterministic=deterministic
        )
        return self.classify(feats)
