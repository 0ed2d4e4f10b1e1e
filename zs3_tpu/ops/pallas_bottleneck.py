"""Fused inference ResNet bottleneck stage (Pallas, TPU).

Motivation (measured on v5e, B64 @513², bf16 — DESIGN.md §4): the
stride-1 bottleneck chains of the R101 backbone are HBM-bandwidth-bound
under XLA because every conv in 1x1 -> 3x3 -> 1x1 round-trips its
activation through HBM (layer1: ~2.4 GB of traffic per block at B64 vs
0.46 TFLOP of compute).  This kernel computes a WHOLE residual block
per spatial tile in VMEM — the two intermediate activations never touch
HBM — cutting per-block traffic to ~read(x) + write(out), the roofline
floor.  Consecutive stride-1 blocks run back-to-back on a padded flat
layout (`fused_stage`), so the one-time pad/unpad cost amortizes.

Scope: eval mode, stride 1, identity skip (BN folded into conv
weights/biases via `fold_bn` — exact at inference).  Downsample /
strided blocks (one per stage) stay on XLA.  Atrous dilation d is
supported (layer3/4); halo rows come from neighbor-tile views of the
same flat array (regular BlockSpecs -> Mosaic auto-pipelining), with
out-of-image halos masked to zero in-kernel.

Layout: Mosaic rejects (rows*W, C) <-> (rows, W, C) shape casts for
non-sublane-aligned W (e.g. 129), so the kernel works entirely on a
FLAT 2-D (positions, channels) view: each image row occupies Wt
(8-aligned, >= PL + w + d) consecutive positions with PL zero columns
on the left; the nine atrous taps are then static flat slices at offset
a*d*Wt + b*d of a zero-extended y1 (a flat shift crosses row boundaries
only inside the masked pad columns).

Reference anchor: zs3/modeling/backbone/resnet.py (class Bottleneck)
[H per SURVEY.md §2.2]; numerics golden-tested against
models/resnet.Bottleneck-equivalent math in tests/test_pallas_bottleneck.py.

STATUS — measured negative result, NOT wired into the model hot path.
On v5e at the real stage shapes (B64) the kernel is oracle-exact but
LOSES to XLA's native conv lowering: layer1x2 19.1 vs 11.2 ms, layer2x3
11.7 vs 9.0 ms, layer3x6 14.9 vs 10.3 ms.  The 3x3-as-nine-thin-matmuls
decomposition (K = planes per tap) cannot match the MXU's implicit-
im2col convolution pipeline (K = 9*planes), and that compute loss
exceeds the HBM-traffic savings the fusion buys.  Kept (tested) as the
documented experiment behind DESIGN.md §4's conclusion that the
remaining layer1/2 "headroom" is not reachable by VMEM fusion.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

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


def _kernel(cur_ref, up_ref, dn_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            w3_ref, b3_ref, out_ref, *,
            th, wt, w, pl_pad, cin, planes, dilation, h):
    d = dilation
    i = pl.program_id(1)
    cur = cur_ref[0]                       # (th*Wt, C)
    xt = jnp.concatenate([up_ref[0], cur, dn_ref[0]], axis=0)

    # 1x1 reduce (+folded BN) + relu, on halo rows too
    y1 = jax.lax.dot_general(
        xt, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...]
    y1 = jnp.maximum(y1, 0.0)

    # Mask: the atrous 3x3 must see ZEROS outside the image (rows beyond
    # [0, H), the PL left-pad columns, and the right-pad columns) — the
    # unfused conv pads y1, so out-of-image positions are exactly 0.
    n1 = (th + 2 * d) * wt
    pos1 = jax.lax.broadcasted_iota(jnp.int32, (n1, 1), 0)
    row1 = i * th - d + pos1 // wt
    col1 = pos1 % wt
    ok1 = (row1 >= 0) & (row1 < h) & (col1 >= pl_pad) & (col1 < pl_pad + w)
    y1 = jnp.where(ok1, y1, 0.0).astype(cur.dtype)

    # zero-extend by d flat positions both ends so every tap slice is
    # in-bounds: tap (a, b) of output q reads y1_ext[q + a*d*Wt + b*d].
    zpad = jnp.zeros((d, planes), cur.dtype)
    y1e = jnp.concatenate([zpad, y1, zpad], axis=0)

    n2 = th * wt
    acc = jnp.broadcast_to(b2_ref[...], (n2, planes)).astype(jnp.float32)
    # Hoist the (sublane-unaligned) column shifts: one shifted copy per
    # b; the three row shifts per b are Wt-multiples = aligned views.
    for b in range(3):
        sb = y1e[b * d : b * d + n2 + 2 * d * wt]
        for a in range(3):
            acc = acc + jax.lax.dot_general(
                sb[a * d * wt : a * d * wt + n2], w2_ref[a, b],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    y2 = jnp.maximum(acc, 0.0).astype(cur.dtype)

    # 1x1 expand (+folded BN) + identity residual + relu
    y3 = jax.lax.dot_general(
        y2, w3_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b3_ref[...]
    out = jnp.maximum(y3 + cur.astype(jnp.float32), 0.0)
    # keep pad columns exactly zero so chained blocks see clean pads
    pos2 = jax.lax.broadcasted_iota(jnp.int32, (n2, 1), 0)
    row2 = i * th + pos2 // wt
    col2 = pos2 % wt
    ok2 = (row2 < h) & (col2 >= pl_pad) & (col2 < pl_pad + w)
    out_ref[0] = jnp.where(ok2, out, 0.0).astype(out_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _flat_geometry(h: int, w: int, dmax: int) -> Tuple[int, int]:
    """(Wt, PL): padded row width (8-aligned) and left zero-pad."""
    pl_pad = dmax
    wt = _round_up(pl_pad + w + dmax, 8)
    return wt, pl_pad


def to_flat(x: jax.Array, wt: int, pl_pad: int, th: int) -> jax.Array:
    """(B, H, W, C) -> (B, T*th*Wt, C) flat padded layout."""
    bsz, h, w, c = x.shape
    t = -(-h // th)
    xp = jnp.pad(
        x, ((0, 0), (0, t * th - h), (pl_pad, wt - pl_pad - w), (0, 0))
    )
    return xp.reshape(bsz, t * th * wt, c)


def from_flat(xf: jax.Array, h: int, w: int, wt: int, pl_pad: int) -> jax.Array:
    bsz = xf.shape[0]
    c = xf.shape[-1]
    x = xf.reshape(bsz, -1, wt, c)[:, :h, pl_pad : pl_pad + w, :]
    return x


def _block_call(xf, params, *, h, w, wt, pl_pad, th, dilation, interpret):
    """One fused block on the flat layout -> flat output."""
    bsz, nflat, cin = xf.shape
    t = nflat // (th * wt)
    w1, b1, w2, b2, w3, b3 = params
    planes = w1.shape[1]
    d = dilation
    assert th % d == 0, (th, d)
    r = th // d
    kern = functools.partial(
        _kernel, th=th, wt=wt, w=w, pl_pad=pl_pad, cin=cin,
        planes=planes, dilation=d, h=h,
    )
    return pl.pallas_call(
        kern,
        grid=(bsz, t),
        in_specs=[
            pl.BlockSpec((1, th * wt, cin), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            # halo views of the same flat array; out-of-image content is
            # masked to zero in-kernel, so edge clamping is safe
            pl.BlockSpec(
                (1, d * wt, cin),
                lambda b, i, r=r: (b, jnp.maximum(i * r - 1, 0), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, d * wt, cin),
                lambda b, i, r=r, t=t: (b, jnp.minimum((i + 1) * r, t * r - 1), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((cin, planes), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, planes), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, planes, planes), lambda b, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, planes), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((planes, cin), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th * wt, cin), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xf.shape, xf.dtype),
        interpret=interpret,
    )(xf, xf, xf,
      w1, b1.astype(jnp.float32).reshape(1, -1),
      w2, b2.astype(jnp.float32).reshape(1, -1),
      w3, b3.astype(jnp.float32).reshape(1, -1))


def _pick_tile(w: int, wt: int, cin: int, planes: int, dmax: int) -> int:
    """Row-tile height: multiple of dmax whose working set fits VMEM."""
    budget = 5 * 1024 * 1024
    th = max(dmax, 8)
    while th % dmax:
        th += 1
    def cost(th):
        n1 = (th + 2 * dmax) * wt
        lanes_p = _round_up(planes, 128)
        lanes_c = _round_up(cin, 128)
        return (
            n1 * lanes_c * 2 + n1 * lanes_p * 2
            + th * wt * lanes_p * 4 + th * wt * lanes_c * 4
            + 2 * th * wt * lanes_c * 2
        )
    best = th
    while cost(th + dmax) <= budget:
        th += dmax
        best = th
        if th >= 64:
            break
    return best


def fused_stage(
    x: jax.Array,
    blocks: Sequence[Tuple[jax.Array, jax.Array, jax.Array, jax.Array,
                           jax.Array, jax.Array]],
    dilations: Sequence[int],
    interpret: bool = False,
) -> jax.Array:
    """Run consecutive stride-1 bottlenecks fused; one pad/unpad total.

    x: (B, H, W, C); each block = (w1 (C,P), b1, w2 (3,3,P,P), b2,
    w3 (P,C), b3) with BN pre-folded.  dilations: per-block d.
    """
    bsz, h, w, cin = x.shape
    dmax = max(dilations)
    wt, pl_pad = _flat_geometry(h, w, dmax)
    planes = blocks[0][0].shape[1]
    th = _pick_tile(w, wt, cin, planes, dmax)
    xf = to_flat(x, wt, pl_pad, th)
    for params, d in zip(blocks, dilations):
        xf = _block_call(
            xf, params, h=h, w=w, wt=wt, pl_pad=pl_pad, th=th,
            dilation=d, interpret=interpret,
        )
    return from_flat(xf, h, w, wt, pl_pad)


def fused_bottleneck(x, w1, b1, w2, b2, w3, b3, dilation=1, interpret=False):
    """Single fused block, NHWC in/out (parity tests; prefer fused_stage
    for chained blocks — the pad/unpad here costs extra traffic)."""
    return fused_stage(
        x, [(w1, b1, w2, b2, w3, b3)], [dilation], interpret=interpret
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
