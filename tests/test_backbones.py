"""Backbone family coverage: shapes, strides, DeepLab assembly, jit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zs3_tpu.models.deeplab import DeepLab
from zs3_tpu.models.drn import DRN54
from zs3_tpu.models.mobilenet import MobileNetV2Backbone
from zs3_tpu.models.xception import AlignedXception


@pytest.mark.parametrize(
    "module,kw,high_ch,low_ch,low_os",
    [
        # heavy non-resnet compiles live in the slow tier (measured
        # 22-35 s each on the 1-core driver box); quick-tier mobilenet
        # coverage comes from test_mobilenet_dilation_rewrite (~8 s)
        pytest.param(AlignedXception, {"output_stride": 16}, 2048, 128, 4,
                     marks=pytest.mark.slow),
        pytest.param(MobileNetV2Backbone, {"output_stride": 16}, 320, 24, 4,
                     marks=pytest.mark.slow),
        pytest.param(DRN54, {}, 512, 256, 4, marks=pytest.mark.slow),
    ],
)
def test_backbone_shapes(module, kw, high_ch, low_ch, low_os):
    m = module(**kw)
    x = jnp.zeros((1, 65, 65, 3))
    variables = m.init(jax.random.key(0), x)
    high, low = m.apply(variables, x)
    os_high = 8 if module is DRN54 else kw.get("output_stride", 16)
    assert high.shape[-1] == high_ch
    assert low.shape[-1] == low_ch
    assert low.shape[1] == 65 // low_os + 1
    assert high.shape[1] == (65 - 1) // os_high + 1


@pytest.mark.slow
def test_xception_os8_spatial():
    m = AlignedXception(output_stride=8)
    x = jnp.zeros((1, 65, 65, 3))
    variables = m.init(jax.random.key(0), x)
    high, _ = m.apply(variables, x)
    assert high.shape[1] == 9  # os8 on 65


@pytest.mark.parametrize("backbone", [
    pytest.param("xception", marks=pytest.mark.slow),
    pytest.param("mobilenet", marks=pytest.mark.slow),
    pytest.param("drn", marks=pytest.mark.slow),
])
def test_deeplab_assembly(backbone):
    m = DeepLab(backbone=backbone, num_classes=5, dropout=False)
    x = jnp.ones((1, 65, 65, 3))
    variables = m.init(jax.random.key(0), x)
    logits = m.apply(variables, x)
    assert logits.shape == (1, 65, 65, 5)
    feats = m.apply(variables, x, method="forward_features")
    assert feats.shape[-1] == 256
    # train mode runs and actually CHANGES the running statistics
    # (truthiness of the returned tree alone would pass even if BN
    # returned its inputs unchanged).
    _, updates = m.apply(
        variables, x, train=True, deterministic=True, mutable=["batch_stats"]
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(after, before)
    )


def test_backbone_and_assembly_smoke_quick():
    """Quick-tier representative for the backbone feature-shape and
    full-assembly contracts (ADVICE r4: after the 65² cases moved to
    the slow tier, neither contract had direct quick coverage).  One
    cheap backbone (mobilenet) at a reduced 33² input: high/low stream
    shapes, logits at input resolution, 256-d split-head features.
    Everything runs under jit so the warm quick tier loads these
    programs from the persistent compile cache instead of re-dispatching
    hundreds of eager convs (measured 22.6 s eager vs 7.5 s jitted-warm
    on the 1-core box)."""
    m = MobileNetV2Backbone(output_stride=16)
    x = jnp.zeros((1, 33, 33, 3))
    high, low = jax.jit(
        lambda: m.apply(m.init(jax.random.key(0), x), x)
    )()
    assert high.shape[-1] == 320 and high.shape[1] == (33 - 1) // 16 + 1
    assert low.shape[-1] == 24 and low.shape[1] == 33 // 4 + 1

    dl = DeepLab(backbone="mobilenet", num_classes=5, dropout=False)

    @jax.jit
    def assemble():
        variables = dl.init(jax.random.key(0), x)
        return (
            dl.apply(variables, x),
            dl.apply(variables, x, method="forward_features"),
        )

    logits, feats = assemble()
    assert logits.shape == (1, 33, 33, 5)
    assert feats.shape[-1] == 256


def test_mobilenet_dilation_rewrite():
    """os8 must keep spatial resolution from stage 3 onward."""
    # init+apply under one jit each so the warm quick tier loads the
    # program from the persistent compile cache instead of dispatching
    # ~100 eager convs (measured 19.3 s eager vs ~6 s jitted-warm on
    # the 1-core box; same trick as the smoke test above).
    m8 = MobileNetV2Backbone(output_stride=8)
    x = jnp.zeros((1, 65, 65, 3))
    high8, _ = jax.jit(lambda: m8.apply(m8.init(jax.random.key(0), x), x))()
    assert high8.shape[1] == 9  # os8
    m16 = MobileNetV2Backbone(output_stride=16)
    high16, _ = jax.jit(lambda: m16.apply(m16.init(jax.random.key(0), x), x))()
    assert high16.shape[1] == 5  # os16
