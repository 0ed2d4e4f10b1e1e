"""Shared NN building blocks: convs with torch-exact padding, BatchNorm.

Layout is NHWC throughout (TPU-native); the torch reference is NCHW and
the weight converter (zs3_tpu.utils.torch_convert) transposes kernels
OIHW -> HWIO.  Convolutions use *explicit symmetric padding* matching
torch's integer `padding=` argument rather than SAME, so strided/dilated
convs are bit-comparable after a weight port (SURVEY.md §7 "hard parts").

BatchNorm: the reference ships a vendored thread/queue SyncBN
(reference: zs3/modeling/sync_batchnorm/batchnorm.py
SynchronizedBatchNorm2d).  On TPU none of that machinery exists: under
jit with a batch sharded over the `data` mesh axis, a plain mean over the
batch axis *is* the global mean (XLA inserts the psum); under shard_map,
pass `axis_name="data"` and flax's BatchNorm pmeans the statistics.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def _pad_pair(p: Union[int, Tuple[int, int]]) -> Tuple[Tuple[int, int], ...]:
    if isinstance(p, int):
        return ((p, p), (p, p))
    return (tuple(p), tuple(p))  # type: ignore[return-value]


class Conv(nn.Module):
    """2-D conv, NHWC, torch-style integer padding, no bias by default."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = False
    dtype: Dtype = jnp.float32
    feature_group_count: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=_pad_pair(self.padding),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            feature_group_count=self.feature_group_count,
            name="conv",
        )(x)


class BatchNorm(nn.Module):
    """BatchNorm2d with optional cross-replica stats.

    `axis_name` triggers a pmean of (mean, var) across that mesh axis —
    the one-line TPU equivalent of the reference's 430-line SyncBN.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis_name=self.axis_name,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)


class ConvBN(nn.Module):
    """conv -> BN -> optional ReLU, the workhorse block."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    relu: bool = True
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    bn_axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = BatchNorm(
            momentum=self.bn_momentum,
            epsilon=self.bn_epsilon,
            axis_name=self.bn_axis_name,
            dtype=self.dtype,
            name="bn",
        )(x, train=train)
        if self.relu:
            x = nn.relu(x)
        return x


def max_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """torch MaxPool2d(kernel_size=3, stride=2, padding=1) equivalent."""
    return nn.max_pool(
        x, window_shape=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
    )


def global_avg_pool(x: jax.Array) -> jax.Array:
    """NHWC -> N11C global average pool (AdaptiveAvgPool2d(1))."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)
