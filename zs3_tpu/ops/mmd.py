"""Gaussian-kernel Maximum Mean Discrepancy (reference jnp implementation).

The reference computes MMD between generated and real per-class pixel
features with a multi-bandwidth Gaussian kernel (reference:
zs3/modeling/gmmn.py class GMMNLoss, get_scale_matrix; bandwidths
{2,5,10,20,40,80} per the GMMN lineage, Li et al. 2015).

This module is the *oracle* implementation: plain jnp, O(N^2) memory,
used on CPU, in tests, and as the autodiff reference.  The production
TPU path is the tiled Pallas kernel in zs3_tpu.ops.pallas_mmd which
accumulates the kernel sums blockwise without materializing the N^2
matrices in HBM.

All entry points take explicit validity masks so ragged per-class pixel
sets stay jit-safe (fixed budgets + masking, never dynamic shapes).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

DEFAULT_SIGMAS: Tuple[float, ...] = (2.0, 5.0, 10.0, 20.0, 40.0, 80.0)


def pairwise_sq_dists(x: jax.Array, y: jax.Array) -> jax.Array:
    """(N, D), (M, D) -> (N, M) squared euclidean distances.

    Computed as |x|^2 + |y|^2 - 2 x.y so the cross term is a single MXU
    matmul; clamped at zero against round-off.
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    xx = jnp.sum(x * x, axis=-1)
    yy = jnp.sum(y * y, axis=-1)
    xy = jnp.dot(x, y.T, preferred_element_type=jnp.float32)
    return jnp.maximum(xx[:, None] + yy[None, :] - 2.0 * xy, 0.0)


def _kernel_sum(
    x: jax.Array,
    y: jax.Array,
    wx: jax.Array,
    wy: jax.Array,
    sigmas: jax.Array,
) -> jax.Array:
    """sum_ij wx_i wy_j sum_s exp(-d2_ij / (2 sigma_s))."""
    d2 = pairwise_sq_dists(x, y)  # (N, M)
    # (S, N, M) exponentials collapsed over S; S is tiny (6).
    k = jnp.sum(jnp.exp(-d2[None] / (2.0 * sigmas[:, None, None])), axis=0)
    return jnp.einsum("n,nm,m->", wx, k, wy)


def mmd_loss(
    fake: jax.Array,
    real: jax.Array,
    fake_mask: jax.Array | None = None,
    real_mask: jax.Array | None = None,
    sigmas: Sequence[float] = DEFAULT_SIGMAS,
) -> jax.Array:
    """Biased MMD estimate between fake (N, D) and real (M, D) features.

    Returns sqrt(max(MMD^2, 0)) — the sqrt form the GMMN lineage trains
    with.  Masks are float/bool (N,), (M,) validity weights; an all-zero
    mask yields 0 loss (guarded denominators), so empty classes in a
    batched vmap are free no-ops.
    """
    if fake.ndim != 2 or real.ndim != 2 or fake.shape[1] != real.shape[1]:
        raise ValueError(
            f"mmd_loss expects (N, D) and (M, D) with equal D; got "
            f"{fake.shape} vs {real.shape}"
        )
    fake = fake.astype(jnp.float32)
    real = real.astype(jnp.float32)
    n = fake.shape[0]
    m = real.shape[0]
    wf = (
        jnp.ones((n,), jnp.float32)
        if fake_mask is None
        else fake_mask.astype(jnp.float32)
    )
    wr = (
        jnp.ones((m,), jnp.float32)
        if real_mask is None
        else real_mask.astype(jnp.float32)
    )
    sig = jnp.asarray(sigmas, dtype=jnp.float32)
    nf = jnp.sum(wf)
    nr = jnp.sum(wr)
    safe_nf = jnp.maximum(nf, 1.0)
    safe_nr = jnp.maximum(nr, 1.0)
    k_ff = _kernel_sum(fake, fake, wf, wf, sig)
    k_rr = _kernel_sum(real, real, wr, wr, sig)
    k_fr = _kernel_sum(fake, real, wf, wr, sig)
    mmd2 = (
        k_ff / (safe_nf * safe_nf)
        + k_rr / (safe_nr * safe_nr)
        - 2.0 * k_fr / (safe_nf * safe_nr)
    )
    both = (nf > 0) & (nr > 0)
    return jnp.where(both, jnp.sqrt(jnp.maximum(mmd2, 1e-12)), 0.0)


def batched_mmd_loss(
    fake: jax.Array,
    real: jax.Array,
    fake_mask: jax.Array,
    real_mask: jax.Array,
    sigmas: Sequence[float] = DEFAULT_SIGMAS,
) -> jax.Array:
    """Mean MMD over a leading class axis: (C, N, D) vs (C, M, D).

    Classes whose masks are all-zero contribute nothing and the mean is
    over classes that have both real and fake pixels.
    """
    per_class = jax.vmap(lambda f, r, mf, mr: mmd_loss(f, r, mf, mr, sigmas))(
        fake, real, fake_mask, real_mask
    )
    present = (jnp.sum(fake_mask, axis=-1) > 0) & (jnp.sum(real_mask, axis=-1) > 0)
    denom = jnp.maximum(jnp.sum(present.astype(jnp.float32)), 1.0)
    return jnp.sum(per_class * present.astype(jnp.float32)) / denom
