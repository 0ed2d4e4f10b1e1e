"""Pallas tiled MMD vs the jnp oracle (interpret mode on CPU).

Values AND gradients must match zs3_tpu.ops.mmd, including padding
(non-multiple-of-128 sizes) and mask edge cases.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zs3_tpu.ops.mmd import mmd_loss
from zs3_tpu.ops.pallas_mmd import kernel_sum, pallas_mmd_loss

INTERP = dict(interpret=True)  # CPU tests run the Pallas interpreter


def _np_kernel_sum(x, y, wx, wy, sigmas=(2.0, 5.0, 10.0, 20.0, 40.0, 80.0)):
    d2 = ((x[:, None] - y[None]) ** 2).sum(-1)
    k = sum(np.exp(-d2 / (2 * s)) for s in sigmas)
    return float(wx @ k @ wy)


@pytest.mark.parametrize("n,m,d", [(128, 128, 128), (256, 128, 256), (50, 70, 16)])
def test_kernel_sum_matches_numpy(n, m, d, rng):
    x = rng.standard_normal((n, d)).astype(np.float32)
    y = rng.standard_normal((m, d)).astype(np.float32)
    wx = (rng.random(n) > 0.3).astype(np.float32)
    wy = (rng.random(m) > 0.3).astype(np.float32)
    ours = float(
        kernel_sum(jnp.asarray(x), jnp.asarray(y), jnp.asarray(wx), jnp.asarray(wy),
                   interpret=True)
    )
    ref = _np_kernel_sum(x, y, wx, wy)
    assert np.isclose(ours, ref, rtol=1e-4), (ours, ref)


def test_pallas_mmd_matches_oracle(rng):
    fake = rng.standard_normal((100, 64)).astype(np.float32)
    real = rng.standard_normal((180, 64)).astype(np.float32) + 0.3
    fm = (rng.random(100) > 0.2).astype(np.float32)
    rm = (rng.random(180) > 0.2).astype(np.float32)
    ours = float(
        pallas_mmd_loss(
            jnp.asarray(fake), jnp.asarray(real), jnp.asarray(fm), jnp.asarray(rm),
            **INTERP,
        )
    )
    ref = float(
        mmd_loss(jnp.asarray(fake), jnp.asarray(real), jnp.asarray(fm), jnp.asarray(rm))
    )
    assert np.isclose(ours, ref, rtol=1e-4), (ours, ref)


@pytest.mark.slow
def test_pallas_mmd_grads_match_oracle(rng):
    fake = rng.standard_normal((40, 32)).astype(np.float32)
    real = rng.standard_normal((60, 32)).astype(np.float32) + 0.5
    fm = np.ones(40, np.float32)
    rm = (rng.random(60) > 0.3).astype(np.float32)

    g_pallas = jax.grad(
        lambda f: pallas_mmd_loss(f, jnp.asarray(real), jnp.asarray(fm),
                                  jnp.asarray(rm), **INTERP)
    )(jnp.asarray(fake))
    g_ref = jax.grad(
        lambda f: mmd_loss(f, jnp.asarray(real), jnp.asarray(fm), jnp.asarray(rm))
    )(jnp.asarray(fake))
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_ref), rtol=1e-3, atol=1e-6
    )


@pytest.mark.slow
def test_pallas_mmd_grad_wrt_real(rng):
    fake = rng.standard_normal((32, 16)).astype(np.float32)
    real = rng.standard_normal((32, 16)).astype(np.float32)
    g_pallas = jax.grad(
        lambda r: pallas_mmd_loss(jnp.asarray(fake), r, **INTERP)
    )(jnp.asarray(real))
    g_ref = jax.grad(lambda r: mmd_loss(jnp.asarray(fake), r))(jnp.asarray(real))
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_ref), rtol=1e-3, atol=1e-6
    )


def test_pallas_mmd_empty_mask(rng):
    fake = rng.standard_normal((16, 8)).astype(np.float32)
    real = rng.standard_normal((16, 8)).astype(np.float32)
    out = float(
        pallas_mmd_loss(
            jnp.asarray(fake), jnp.asarray(real),
            jnp.zeros(16), jnp.ones(16), **INTERP,
        )
    )
    assert out == 0.0
