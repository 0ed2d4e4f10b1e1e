"""Golden tests for the fused classify+resize Pallas tail.

Oracle: `resize_bilinear(feats @ w + b, size, align_corners=True)` —
the exact XLA tail the kernel replaces (zs3_tpu.models.deeplab.DeepLab:
classify -> upsample_logits; reference F.interpolate align_corners=True
semantics per SURVEY.md §2.2).  Interpret mode runs the real kernel
logic (grid, banded H matrix, halo block, lane packing) on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zs3_tpu.ops.pallas_tail import (
    classify_resize,
    classify_resize_fused,
    supported,
)
from zs3_tpu.ops.resize import resize_bilinear


def _oracle(feats, w, b, size):
    logits = feats @ w.astype(feats.dtype) + b.astype(feats.dtype)
    return resize_bilinear(logits, size, align_corners=True)


@pytest.mark.parametrize(
    "bsz,hw,c,k",
    [
        (2, 17, 16, 5),    # crop-65 geometry, odd class count
        (1, 9, 8, 21),     # minimal grid (1 full + 1 partial row tile)
        (3, 17, 32, 128),  # pack=1 boundary (128 classes fills lanes)
    ],
)
def test_fused_tail_matches_oracle_f32(bsz, hw, c, k):
    size = (4 * (hw - 1) + 1, 4 * (hw - 1) + 1)
    assert supported((hw, hw), size, k)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((bsz, hw, hw, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((c, k)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((k,)) * 0.1, jnp.float32)
    got = classify_resize_fused(feats, w, b, size, interpret=True)
    want = _oracle(feats, w, b, size)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_fused_tail_matches_oracle_bf16():
    """bf16 features (the TPU serving dtype): kernel accumulates in f32
    like the XLA DEFAULT-precision einsum tail; tolerance at bf16 grain."""
    rng = np.random.default_rng(1)
    feats = jnp.asarray(
        rng.standard_normal((2, 17, 17, 16)), jnp.bfloat16
    )
    w = jnp.asarray(rng.standard_normal((16, 7)) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((7,)) * 0.1, jnp.float32)
    size = (65, 65)
    got = classify_resize_fused(feats, w, b, size, interpret=True)
    want = _oracle(feats, w, b, size)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.05, atol=0.05,
    )


def test_supported_contract():
    assert supported((129, 129), (513, 513), 21)
    assert not supported((129, 129), (513, 512), 21)   # not exact 4x
    assert not supported((128, 128), (509, 509), 21)   # (h-1) % 8 != 0
    assert not supported((129, 129), (513, 513), 129)  # K > lane width
    assert not supported((5, 5), (17, 17), 21)         # h <= band


def test_dispatch_oracle_off_tpu():
    """On CPU the dispatcher must take the jnp oracle path (bitwise
    equal to the oracle, no interpret-mode kernel)."""
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.standard_normal((1, 9, 9, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((8, 3)), jnp.float32)
    b = jnp.zeros((3,), jnp.float32)
    got = classify_resize(feats, w, b, (33, 33))
    want = _oracle(feats, w, b, (33, 33))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.slow
def test_deeplab_fused_tail_flag_matches_standard():
    """DeepLab(fused_tail=True) must produce the same logits as the
    standard tail (on CPU the op dispatches to its jnp oracle, which
    still exercises the in-module classifier-param extraction), and
    train-mode must keep the XLA tail (the fused op has no VJP)."""
    from zs3_tpu.models.deeplab import DeepLab

    x = jnp.ones((1, 33, 33, 3))
    base = DeepLab(backbone="resnet50", num_classes=6, dropout=False)
    fused = DeepLab(
        backbone="resnet50", num_classes=6, dropout=False, fused_tail=True
    )
    variables = jax.jit(base.init)(jax.random.key(0), x)
    want = jax.jit(lambda v: base.apply(v, x))(variables)
    got = jax.jit(lambda v: fused.apply(v, x))(variables)
    assert got.shape == (1, 33, 33, 6)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )
    # train=True takes the standard differentiable tail: grads flow
    def loss(v):
        out, _ = fused.apply(
            v, x, train=True, deterministic=True, mutable=["batch_stats"]
        )
        return jnp.sum(out**2)

    g = jax.jit(jax.grad(loss))(variables)
    leaves = jax.tree_util.tree_leaves(g["params"])
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
