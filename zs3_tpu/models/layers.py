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


class _ConvImpl(nn.Module):
    """Direct lax conv with nn.Conv's exact param layout (kernel/bias).

    Replaces the earlier nn.Conv delegation so the int8 inference path
    (zs3_tpu.quant) can reach the kernel parameter: when an activation
    scale for this module's path is active (quant.scale_for) and the
    input is not lane-starved (>= quant.MIN_QUANT_IN_CH channels),
    the conv runs as s8 x s8 -> s32 on the MXU — v5e executes int8 at
    ~1.4-2x the bf16 rate (measured: 168 vs 116 TF/s on a chained
    3x3x256 conv; 309 vs 147 on 8192^3 matmuls) — and dequantizes into
    the output dtype.  Checkpoints/converters are unaffected: param
    tree, init, and float math are identical to nn.Conv.
    """

    features: int
    kernel_size: int
    stride: int
    padding: Union[int, Tuple[int, int]]
    dilation: int
    use_bias: bool
    dtype: Dtype
    feature_group_count: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1] // self.feature_group_count
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, in_ch, self.features),
            jnp.float32,
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            if self.use_bias
            else None
        )
        dn = ("NHWC", "HWIO", "NHWC")
        pad = _pad_pair(self.padding)
        strides = (self.stride, self.stride)
        rhs_dil = (self.dilation, self.dilation)

        from zs3_tpu import quant

        act_scale = quant.scale_for(self.path)
        quantizable = (
            self.feature_group_count == 1
            and x.shape[-1] >= quant.MIN_QUANT_IN_CH
        )
        if act_scale is not None and quantizable:
            y = quant.int8_conv(
                x, kernel, act_scale, strides, pad, rhs_dil, self.dtype
            )
        else:
            if (
                quantizable
                and quant.qat_active()
                and not quant.path_excluded(self.path)
            ):
                # QAT: fake-quantize both operands onto the int8 grid
                # (straight-through gradients), then run the float conv.
                x, kernel = quant.fake_quant_conv_operands(x, kernel)
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                strides,
                pad,
                rhs_dilation=rhs_dil,
                dimension_numbers=dn,
                feature_group_count=self.feature_group_count,
            )
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


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
        return _ConvImpl(
            features=self.features,
            kernel_size=self.kernel_size,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            use_bias=self.use_bias,
            dtype=self.dtype,
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


class _Kernel(nn.Module):
    """Bare conv-kernel parameter holder (path <parent>/conv/kernel, the
    same tree position nn.Conv would create, so converters/checkpoints
    are layout-identical)."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32
        )


def stem_conv_s2d(x: jax.Array, kernel: jax.Array, dtype) -> jax.Array:
    """EXACT space-to-depth rewrite of conv(7x7, stride 2, pad 3).

    The direct 7x7/s2 stem runs at ~14 TF/s on v5e because C_in=3
    starves the MXU's 128-lane contraction (measured, DESIGN.md §4).
    Rearranging 2x2 input blocks into channels turns it into a 4x4
    stride-1 VALID conv with 4*C_in input channels — identical math
    (tap-for-tap; the only difference is float summation order).  The
    trick comes from the public TPU ResNet/MLPerf lineage, but MEASURED
    SLOWER here (7.8 vs 5.9 ms at B64: the (..., 2, 2, 3)->(..., 12)
    phase transpose is itself lane-starved at 3 channels), so
    ResNetAtrous defaults it off; kept as a tested negative result.
    """
    b, h, w, c = x.shape
    feats = kernel.shape[-1]
    hs, ws = (h + 7) // 2, (w + 7) // 2
    x = x.astype(dtype)
    xp = jnp.pad(x, ((0, 0), (3, 2 * hs - h - 3), (3, 2 * ws - w - 3), (0, 0)))
    xs = (
        xp.reshape(b, hs, 2, ws, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, hs, ws, 4 * c)
    )
    # w4[p, q, (2*pa+qa)*c + ci, o] = w[2p+pa, 2q+qa, ci, o]
    w4 = jnp.zeros((4, 4, 4 * c, feats), kernel.dtype)
    for pa in range(2):
        for qa in range(2):
            sub = kernel[pa::2, qa::2]
            ph = (2 * pa + qa) * c
            w4 = w4.at[: sub.shape[0], : sub.shape[1], ph : ph + c, :].set(sub)
    return jax.lax.conv_general_dilated(
        xs, w4.astype(dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class StemConv(nn.Module):
    """7x7/2 pad-3 stem conv; s2d=True dispatches to the space-to-depth
    rewrite (exact, but MEASURED SLOWER on this v5e — 7.8 vs 5.9 ms at
    B64, DESIGN.md §4 — hence default off).  Param tree matches the
    plain Conv wrapper (<name>/conv/kernel)."""

    features: int = 64
    dtype: Dtype = jnp.float32
    s2d: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = _Kernel(shape=(7, 7, x.shape[-1], self.features), name="conv")()
        if not self.s2d:
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype), (2, 2),
                [(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return stem_conv_s2d(x, kernel, self.dtype)


def max_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """torch MaxPool2d(kernel_size=3, stride=2, padding=1) equivalent."""
    return nn.max_pool(
        x, window_shape=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
    )


def global_avg_pool(x: jax.Array) -> jax.Array:
    """NHWC -> N11C global average pool (AdaptiveAvgPool2d(1))."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)
