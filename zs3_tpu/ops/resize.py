"""Bilinear / nearest resize as MXU-friendly matmuls.

The reference upsamples with ``F.interpolate(..., mode='bilinear',
align_corners=True)`` (reference: zs3/modeling/deeplab.py DeepLab.forward,
decoder.py) — align_corners=True is load-bearing for mIoU parity.
``jax.image.resize`` has no align_corners mode, so we build the (out, in)
interpolation matrix explicitly at trace time (shapes are static under
jit) and apply it as two small matmuls over H then W.  On TPU these land
on the MXU and fuse with neighboring ops, instead of the gather/scatter
pattern a naive port would produce.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=128)
def _linear_matrix_np(
    in_size: int, out_size: int, align_corners: bool
) -> np.ndarray:
    """Row-stochastic (out_size, in_size) 1-D linear interpolation matrix."""
    w = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        w[:, 0] = 1.0
        return w
    if out_size == 1:
        # align_corners picks source 0; half-pixel picks the center.
        if align_corners:
            w[0, 0] = 1.0
        else:
            pos = 0.5 * in_size / 1.0 - 0.5
            lo = int(np.clip(np.floor(pos), 0, in_size - 1))
            hi = min(lo + 1, in_size - 1)
            frac = pos - lo
            w[0, lo] += 1.0 - frac
            w[0, hi] += frac
        return w
    if align_corners:
        pos = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        pos = (np.arange(out_size, dtype=np.float64) + 0.5) * in_size / out_size - 0.5
        pos = np.clip(pos, 0.0, in_size - 1)
    lo = np.floor(pos).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (pos - lo).astype(np.float32)
    rows = np.arange(out_size)
    np.add.at(w, (rows, lo), 1.0 - frac)
    np.add.at(w, (rows, hi), frac)
    return w


def resize_bilinear(
    x: jax.Array,
    size: Tuple[int, int],
    align_corners: bool = True,
) -> jax.Array:
    """Bilinear-resize NHWC (or HWC) images to `size` = (H_out, W_out).

    Precision policy: f32 inputs interpolate with full-precision matmuls
    (the TPU default would truncate weights to bf16 and break golden
    parity with torch); bf16 inputs stay on the fast MXU path — their
    own quantization already dwarfs the matmul rounding.
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    out_h, out_w = size
    orig_dtype = x.dtype
    if orig_dtype == jnp.bfloat16:
        y = x
        precision = jax.lax.Precision.DEFAULT
        wdtype = jnp.bfloat16
    else:
        y = x.astype(jnp.float32)
        precision = jax.lax.Precision.HIGHEST
        wdtype = jnp.float32
    if out_h != h:
        wh = jnp.asarray(_linear_matrix_np(h, out_h, align_corners), dtype=wdtype)
        y = jnp.einsum("oh,bhwc->bowc", wh, y, precision=precision)
    if out_w != w:
        ww = jnp.asarray(_linear_matrix_np(w, out_w, align_corners), dtype=wdtype)
        y = jnp.einsum("ow,bhwc->bhoc", ww, y, precision=precision)
    y = y.astype(orig_dtype)
    return y[0] if squeeze else y


@functools.lru_cache(maxsize=128)
def _nearest_index_np(in_size: int, out_size: int) -> np.ndarray:
    # torch 'nearest' semantics: floor(i * in/out).
    idx = np.floor(np.arange(out_size) * in_size / out_size).astype(np.int32)
    return np.clip(idx, 0, in_size - 1)


def resize_nearest(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Nearest-neighbor resize for label maps. NHW, NHWC or HW layouts."""
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    h, w = x.shape[1], x.shape[2]
    out_h, out_w = size
    if out_h != h:
        x = jnp.take(x, jnp.asarray(_nearest_index_np(h, out_h)), axis=1)
    if out_w != w:
        x = jnp.take(x, jnp.asarray(_nearest_index_np(w, out_w)), axis=2)
    return x[0] if squeeze else x
