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


def resolve_weights(
    fake: jax.Array,
    real: jax.Array,
    fake_mask: jax.Array | None,
    real_mask: jax.Array | None,
) -> Tuple[jax.Array, jax.Array]:
    """(N,), (M,) float32 validity weights (all-ones when mask is None)."""
    wf = (
        jnp.ones((fake.shape[0],), jnp.float32)
        if fake_mask is None
        else fake_mask.astype(jnp.float32)
    )
    wr = (
        jnp.ones((real.shape[0],), jnp.float32)
        if real_mask is None
        else real_mask.astype(jnp.float32)
    )
    return wf, wr


def assemble_sqrt_mmd(
    k_ff: jax.Array, k_rr: jax.Array, k_fr: jax.Array,
    nf: jax.Array, nr: jax.Array,
) -> jax.Array:
    """sqrt-MMD from the three weighted kernel sums.

    Single source of the estimator semantics (guarded denominators,
    1e-12 sqrt floor, empty-side -> 0) shared by the jnp oracle and the
    Pallas backend so the CPU/test and TPU/production losses can never
    diverge.
    """
    safe_nf = jnp.maximum(nf, 1.0)
    safe_nr = jnp.maximum(nr, 1.0)
    mmd2 = (
        k_ff / (safe_nf * safe_nf)
        + k_rr / (safe_nr * safe_nr)
        - 2.0 * k_fr / (safe_nf * safe_nr)
    )
    both = (nf > 0) & (nr > 0)
    return jnp.where(both, jnp.sqrt(jnp.maximum(mmd2, 1e-12)), 0.0)


def mean_over_present_classes(
    per_class: jax.Array, fake_mask: jax.Array, real_mask: jax.Array
) -> jax.Array:
    """Mean of per-class losses over classes with both sides non-empty."""
    present = (jnp.sum(fake_mask, axis=-1) > 0) & (jnp.sum(real_mask, axis=-1) > 0)
    denom = jnp.maximum(jnp.sum(present.astype(jnp.float32)), 1.0)
    return jnp.sum(per_class * present.astype(jnp.float32)) / denom


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
    wf, wr = resolve_weights(fake, real, fake_mask, real_mask)
    sig = jnp.asarray(sigmas, dtype=jnp.float32)
    k_ff = _kernel_sum(fake, fake, wf, wf, sig)
    k_rr = _kernel_sum(real, real, wr, wr, sig)
    k_fr = _kernel_sum(fake, real, wf, wr, sig)
    return assemble_sqrt_mmd(k_ff, k_rr, k_fr, jnp.sum(wf), jnp.sum(wr))


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
    return mean_over_present_classes(per_class, fake_mask, real_mask)
