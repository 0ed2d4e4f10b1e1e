"""Fused inference ResNet bottleneck (Pallas, TPU).

Motivation (measured on v5e, B64 @513², bf16 — see DESIGN.md §4): the
stride-1 bottleneck stages of the R101 backbone are HBM-bandwidth-bound
under XLA, because every conv in the 1x1 -> 3x3 -> 1x1 chain round-trips
its activation through HBM (~2.4 GB per layer1 block at B64 vs ~0.46
TFLOP of compute).  This kernel computes the WHOLE residual block per
spatial tile in VMEM — the two intermediate activations never exist in
HBM — cutting the block's traffic to read(x) + write(out) (~1.1 GB),
which is the roofline floor.

Scope: eval mode only (BN folded into conv weights/biases — exact at
inference), stride 1, no downsample branch (the identity residual is the
input tile).  Downsample/strided blocks (one per stage) stay on XLA.
Supports the atrous dilation d of layer3/4 (halo rows = d).

Tiling: grid (B, H/TH).  Row-tile halos arrive as separately-gathered
(d, W, C) tensors built by `_halo_rows` on the XLA side (~2d/TH extra
read traffic) so every kernel input uses a regular BlockSpec and Mosaic
auto-pipelines HBM<->VMEM.  Width halo is a VMEM zero-pad.

Reference anchor: zs3/modeling/backbone/resnet.py (class Bottleneck)
[H per SURVEY.md §2.2]; numerics match models/resnet.Bottleneck in eval
mode (golden-tested in tests/test_pallas_bottleneck.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn(kernel, scale, bias, mean, var, eps: float = 1e-5):
    """Fold an eval-mode BN into the preceding conv.

    kernel: (kh, kw, Cin, Cout); BN params (Cout,).  Returns
    (kernel', bias') with conv(x, kernel') + bias' == bn(conv(x, kernel)).
    """
    inv = scale / jnp.sqrt(var + eps)
    return kernel * inv[None, None, None, :], bias - mean * inv


def _kernel(up_ref, cur_ref, dn_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            w3_ref, b3_ref, out_ref, *, th, w, cin, planes, dilation, h):
    d = dilation
    up = up_ref[0, 0]    # (d, W, C)
    cur = cur_ref[0]     # (TH, W, C)
    dn = dn_ref[0, 0]    # (d, W, C)
    xt = jnp.concatenate([up, cur, dn], axis=0)  # (TH+2d, W, C)

    # 1x1 reduce + folded BN + relu, on halo rows too
    flat = xt.reshape(-1, cin)
    y1 = jax.lax.dot_general(
        flat, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...]
    y1 = jnp.maximum(y1, 0.0).astype(cur.dtype).reshape(th + 2 * d, w, planes)
    # The atrous 3x3 consumes Y1 zero-padded at the IMAGE boundary (the
    # oracle pads after conv1): halo rows outside the image must be
    # exactly zero, not relu(b1) from zero-padded x.
    i = pl.program_id(1)
    row0 = i * th - d
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (th + 2 * d, 1, 1), 0)
    in_image = (rows >= 0) & (rows < h)
    y1 = jnp.where(in_image, y1, jnp.zeros_like(y1))

    # zero-pad width by d for the atrous 3x3
    zcol = jnp.zeros((th + 2 * d, d, planes), cur.dtype)
    y1p = jnp.concatenate([zcol, y1, zcol], axis=1)  # (TH+2d, W+2d, P)

    # 3x3 (dilated) as 9 shifted (TH*W, P) @ (P, P) matmuls
    acc = jnp.broadcast_to(b2_ref[...], (th * w, planes)).astype(jnp.float32)
    for a in range(3):
        for b in range(3):
            sl = y1p[a * d : a * d + th, b * d : b * d + w, :].reshape(-1, planes)
            acc = acc + jax.lax.dot_general(
                sl, w2_ref[a, b], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    y2 = jnp.maximum(acc, 0.0).astype(cur.dtype)

    # 1x1 expand + folded BN + residual + relu
    y3 = jax.lax.dot_general(
        y2, w3_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b3_ref[...]
    out = jnp.maximum(
        y3.reshape(th, w, cin) + cur.astype(jnp.float32), 0.0
    )
    out_ref[0] = out.astype(out_ref.dtype)


def _halo_rows(x: jax.Array, th: int, d: int) -> Tuple[jax.Array, jax.Array]:
    """(B, T, d, W, C) halo rows above/below each row tile (zeros at the
    image boundary)."""
    bsz, h, w, c = x.shape
    t = h // th
    xp = jnp.pad(x, ((0, 0), (d, d), (0, 0), (0, 0)))
    up = jnp.stack([xp[:, i * th : i * th + d] for i in range(t)], axis=1)
    dn = jnp.stack(
        [xp[:, d + (i + 1) * th : 2 * d + (i + 1) * th] for i in range(t)],
        axis=1,
    )
    return up, dn


def _pick_tile(h: int, w: int, cin: int, planes: int, d: int) -> int:
    """Largest TH dividing H whose working set fits a VMEM budget."""
    budget = 6 * 1024 * 1024  # double-buffered by Mosaic -> ~12MB peak
    best = None
    for th in range(h, 0, -1):
        if h % th:
            continue
        if th <= d:
            continue
        bytes_needed = (
            (th + 2 * d) * w * cin * 2          # xt
            + (th + 2 * d) * (w + 2 * d) * planes * 2  # y1p
            + th * w * planes * 4                # acc (f32)
            + th * w * cin * 2                   # out
        )
        if bytes_needed <= budget:
            return th
        best = th
    return best or 1


def fused_bottleneck(
    x: jax.Array,
    w1: jax.Array, b1: jax.Array,
    w2: jax.Array, b2: jax.Array,
    w3: jax.Array, b3: jax.Array,
    dilation: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """Residual bottleneck, eval mode, stride 1, identity skip.

    x: (B, H, W, C); w1 (C, P), w2 (3, 3, P, P), w3 (P, C); biases f32
    (BN pre-folded via fold_bn).  Returns (B, H, W, C) in x.dtype.
    """
    bsz, h, w, cin = x.shape
    planes = w1.shape[1]
    d = dilation
    th = _pick_tile(h, w, cin, planes, d)
    t = h // th
    up, dn = _halo_rows(x, th, d)
    kern = functools.partial(
        _kernel, th=th, w=w, cin=cin, planes=planes, dilation=d, h=h
    )
    grid = (bsz, t)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, d, w, cin), lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w, cin), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d, w, cin), lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, planes), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((planes,), lambda b, i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, planes, planes), lambda b, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((planes,), lambda b, i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((planes, cin), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin,), lambda b, i: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, cin), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, cin), x.dtype),
        interpret=interpret,
    )(
        up.reshape(bsz, t, d, w, cin),
        x,
        dn.reshape(bsz, t, d, w, cin),
        w1, b1.astype(jnp.float32), w2, b2.astype(jnp.float32),
        w3, b3.astype(jnp.float32),
    )


def bottleneck_oracle(x, w1, b1, w2, b2, w3, b3, dilation=1):
    """jnp reference with identical math (folded-BN convs)."""
    y = jax.lax.conv_general_dilated(
        x, w1[None, None], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + b1
    y = jnp.maximum(y, 0).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        y, w2, (1, 1), [(dilation, dilation)] * 2,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + b2
    y = jnp.maximum(y, 0).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        y, w3[None, None], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + b3
    return jnp.maximum(y + x.astype(jnp.float32), 0).astype(x.dtype)
