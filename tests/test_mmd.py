"""MMD loss vs an O(N^2) numpy oracle, plus mask semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zs3_tpu.ops.mmd import (
    DEFAULT_SIGMAS,
    batched_mmd_loss,
    mmd_loss,
    pairwise_sq_dists,
)


def np_mmd(fake, real, wf, wr, sigmas=DEFAULT_SIGMAS):
    def ksum(x, y, wx, wy):
        d2 = ((x[:, None] - y[None]) ** 2).sum(-1)
        k = sum(np.exp(-d2 / (2 * s)) for s in sigmas)
        return float(wx @ k @ wy)

    nf, nr = max(wf.sum(), 1), max(wr.sum(), 1)
    mmd2 = (
        ksum(fake, fake, wf, wf) / nf**2
        + ksum(real, real, wr, wr) / nr**2
        - 2 * ksum(fake, real, wf, wr) / (nf * nr)
    )
    if wf.sum() == 0 or wr.sum() == 0:
        return 0.0
    return float(np.sqrt(max(mmd2, 1e-12)))


def test_pairwise_sq_dists(rng):
    x = rng.standard_normal((7, 5)).astype(np.float32)
    y = rng.standard_normal((9, 5)).astype(np.float32)
    ours = np.asarray(pairwise_sq_dists(jnp.asarray(x), jnp.asarray(y)))
    ref = ((x[:, None] - y[None]) ** 2).sum(-1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_mmd_matches_numpy(rng):
    fake = rng.standard_normal((32, 16)).astype(np.float32)
    real = rng.standard_normal((24, 16)).astype(np.float32) + 0.5
    wf = np.ones(32, np.float32)
    wr = np.ones(24, np.float32)
    ours = float(mmd_loss(jnp.asarray(fake), jnp.asarray(real)))
    assert np.isclose(ours, np_mmd(fake, real, wf, wr), rtol=1e-4)


def test_mmd_masked_equals_dense_subset(rng):
    """Masked-out rows must be equivalent to physically removing them."""
    fake = rng.standard_normal((20, 8)).astype(np.float32)
    real = rng.standard_normal((20, 8)).astype(np.float32)
    wf = (rng.random(20) > 0.4).astype(np.float32)
    wr = (rng.random(20) > 0.4).astype(np.float32)
    masked = float(
        mmd_loss(jnp.asarray(fake), jnp.asarray(real), jnp.asarray(wf), jnp.asarray(wr))
    )
    dense = float(mmd_loss(jnp.asarray(fake[wf > 0]), jnp.asarray(real[wr > 0])))
    assert np.isclose(masked, dense, rtol=1e-4)


def test_mmd_identical_distributions_small(rng):
    x = rng.standard_normal((64, 4)).astype(np.float32)
    same = float(mmd_loss(jnp.asarray(x), jnp.asarray(x)))
    shifted = float(mmd_loss(jnp.asarray(x), jnp.asarray(x + 3.0)))
    assert same < 0.05
    assert shifted > same


def test_mmd_empty_mask_is_zero(rng):
    fake = rng.standard_normal((8, 4)).astype(np.float32)
    real = rng.standard_normal((8, 4)).astype(np.float32)
    zero = jnp.zeros(8)
    assert float(mmd_loss(jnp.asarray(fake), jnp.asarray(real), zero, None)) == 0.0


def test_mmd_grad_finite(rng):
    fake = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))
    real = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))
    g = jax.grad(lambda f: mmd_loss(f, real))(fake)
    assert np.all(np.isfinite(np.asarray(g)))


def test_batched_mmd_skips_empty_classes(rng):
    c, n, d = 4, 12, 6
    fake = jnp.asarray(rng.standard_normal((c, n, d)).astype(np.float32))
    real = jnp.asarray(rng.standard_normal((c, n, d)).astype(np.float32))
    fm = jnp.ones((c, n)).at[2].set(0.0)  # class 2 has no fake pixels
    rm = jnp.ones((c, n))
    loss = batched_mmd_loss(fake, real, fm, rm)
    per = [
        float(mmd_loss(fake[i], real[i], fm[i], rm[i])) for i in (0, 1, 3)
    ]
    assert np.isclose(float(loss), np.mean(per), rtol=1e-4)


def test_mmd_shape_validation(rng):
    with pytest.raises(ValueError):
        mmd_loss(jnp.zeros((4, 3)), jnp.zeros((4, 5)))  # D mismatch
    with pytest.raises(ValueError):
        mmd_loss(jnp.zeros((4,)), jnp.zeros((4, 5)))  # rank
