"""Fused bottleneck kernel + s2d stem: oracle parity (interpret mode).

Both are measured NEGATIVE results on v5e (slower than XLA's native
conv lowering — DESIGN.md §4) kept as tested experiments; these tests
pin their exactness so the measurements stay trustworthy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zs3_tpu.ops.pallas_bottleneck import (
    bottleneck_oracle,
    fold_bn,
    fused_bottleneck,
    fused_stage,
)


def _mk_block(rng, c, p):
    mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
    return (mk(c, p), mk(p), mk(3, 3, p, p), mk(p), mk(p, c), mk(c))


@pytest.mark.parametrize(
    "shape",
    [(2, 12, 10, 32, 16, 1), (1, 12, 10, 32, 16, 2), (2, 9, 11, 16, 8, 1),
     (1, 33, 33, 64, 32, 4)],
)
def test_fused_bottleneck_matches_oracle(shape, rng):
    b, h, w, c, p, d = shape
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    blk = _mk_block(rng, c, p)
    out = fused_bottleneck(x, *blk, dilation=d, interpret=True)
    ref = bottleneck_oracle(x, *blk, dilation=d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_stage_chains_blocks(rng):
    b, h, w, c, p = 2, 13, 11, 32, 16
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    dils = [1, 2, 1]
    blocks = [_mk_block(rng, c, p) for _ in dils]
    out = fused_stage(x, blocks, dils, interpret=True)
    ref = x
    for blk, d in zip(blocks, dils):
        ref = bottleneck_oracle(ref, *blk, dilation=d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fold_bn_is_exact(rng):
    """conv+BN(eval) == conv with folded weights."""
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 4, 6)) * 0.2, jnp.float32)
    scale = jnp.asarray(rng.standard_normal(6) * 0.1 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(6) * 0.1, jnp.float32)
    mean = jnp.asarray(rng.standard_normal(6) * 0.1, jnp.float32)
    var = jnp.asarray(rng.random(6) + 0.5, jnp.float32)
    eps = 1e-5
    conv = lambda x, k: jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    ref = (conv(x, k) - mean) / jnp.sqrt(var + eps) * scale + bias
    kf, bf = fold_bn(k, scale, bias, mean, var, eps)
    np.testing.assert_allclose(
        np.asarray(conv(x, kf) + bf), np.asarray(ref), atol=1e-5
    )


def test_stem_s2d_exact(rng):
    from zs3_tpu.models.layers import stem_conv_s2d

    for h, w in ((65, 65), (64, 66), (33, 47)):
        x = jnp.asarray(rng.standard_normal((2, h, w, 3)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((7, 7, 3, 8)) * 0.1, jnp.float32)
        direct = jax.lax.conv_general_dilated(
            x, k, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        s2d = stem_conv_s2d(x, k, jnp.float32)
        np.testing.assert_allclose(
            np.asarray(s2d), np.asarray(direct), atol=1e-5
        )


def test_stem_s2d_in_backbone(rng):
    """ResNetAtrous output is (float-noise) identical with the flag on."""
    from zs3_tpu.models.resnet import ResNetAtrous

    x = jnp.asarray(rng.standard_normal((1, 65, 65, 3)), jnp.float32)
    m_off = ResNetAtrous(layers=(1, 1, 1, 1), stem_s2d=False)
    m_on = ResNetAtrous(layers=(1, 1, 1, 1), stem_s2d=True)
    v = m_off.init(jax.random.key(0), x)
    hi_off, lo_off = m_off.apply(v, x, train=False)
    hi_on, lo_on = m_on.apply(v, x, train=False)
    np.testing.assert_allclose(
        np.asarray(hi_on), np.asarray(hi_off), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(lo_on), np.asarray(lo_off), atol=1e-3
    )


def test_oracle_matches_model_bottleneck(rng):
    """bottleneck_oracle — the parity target every fused-kernel test
    pins against — must itself equal the real models.resnet.Bottleneck
    (eval mode, BN folded via fold_bn).  Without this anchor the kernel
    and its oracle could share a deviation from the block they claim to
    fuse, and the negative-result measurements would compare the wrong
    computation."""
    from zs3_tpu.models.resnet import Bottleneck

    planes, H = 4, 8
    m = Bottleneck(planes=planes, dilation=2)
    x = jnp.asarray(rng.standard_normal((1, H, H, planes * 4)), jnp.float32)
    variables = m.init(jax.random.key(0), x)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    # Non-trivial BN parameters/statistics so the folding is exercised.
    gen = np.random.default_rng(1)
    for bn in ("bn1", "bn2", "bn3"):
        n = params[bn]["bn"]["scale"].shape[0]
        params[bn]["bn"]["scale"] = gen.uniform(0.5, 1.5, n).astype(np.float32)
        params[bn]["bn"]["bias"] = gen.standard_normal(n).astype(np.float32)
        stats[bn]["bn"]["mean"] = (0.1 * gen.standard_normal(n)).astype(
            np.float32
        )
        stats[bn]["bn"]["var"] = gen.uniform(0.5, 1.5, n).astype(np.float32)
    ref = m.apply({"params": params, "batch_stats": stats}, x, train=False)

    def fold(conv, bn):
        return fold_bn(
            jnp.asarray(params[conv]["conv"]["kernel"]),
            jnp.asarray(params[bn]["bn"]["scale"]),
            jnp.asarray(params[bn]["bn"]["bias"]),
            jnp.asarray(stats[bn]["bn"]["mean"]),
            jnp.asarray(stats[bn]["bn"]["var"]),
        )

    w1, b1 = fold("conv1", "bn1")
    w2, b2 = fold("conv2", "bn2")
    w3, b3 = fold("conv3", "bn3")
    got = bottleneck_oracle(
        x, w1[0, 0], b1, w2, b2, w3[0, 0], b3, dilation=2
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4
    )
