"""Model structure tests: shapes, split-head consistency, jit parity.

Uses resnet50 at 65x65 to keep CPU compile time sane; the architecture
code paths (stride/dilation plan, multigrid, ASPP dilations, decoder
split) are identical for resnet101.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zs3_tpu.models.deeplab import DeepLab
from zs3_tpu.models.gmmn import GMMNGenerator, GraphContextGMMN


@pytest.fixture(scope="module")
def small_model():
    m = DeepLab(backbone="resnet50", num_classes=7, dropout=False)
    x = jnp.zeros((1, 65, 65, 3))
    variables = m.init(jax.random.key(0), x)
    return m, variables


def test_output_shapes(small_model):
    m, variables = small_model
    x = jnp.ones((2, 65, 65, 3))
    logits = m.apply(variables, x)
    assert logits.shape == (2, 65, 65, 7)
    assert logits.dtype == jnp.float32
    feats = m.apply(variables, x, method="forward_features")
    assert feats.shape == (2, 17, 17, 256)


def test_split_head_consistency(small_model):
    """features -> classify -> upsample must equal the fused forward."""
    m, variables = small_model
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 65, 65, 3)), jnp.float32)
    fused = m.apply(variables, x)
    feats = m.apply(variables, x, method="forward_features")
    logits = m.apply(variables, feats, method="classify")
    split = m.apply(variables, logits.astype(jnp.float32), (65, 65), method="upsample_logits")
    np.testing.assert_allclose(np.asarray(fused), np.asarray(split), atol=1e-5)


def test_jit_matches_eager(small_model):
    m, variables = small_model
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 65, 65, 3)), jnp.float32)
    eager = m.apply(variables, x)
    jitted = jax.jit(lambda v, xx: m.apply(v, xx))(variables, x)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), atol=1e-4)


@pytest.mark.slow
def test_output_stride_8():
    m = DeepLab(backbone="resnet50", output_stride=8, num_classes=3, dropout=False)
    x = jnp.zeros((1, 33, 33, 3))
    variables = m.init(jax.random.key(0), x)
    feats = m.apply(variables, x, method="forward_features")
    assert feats.shape == (1, 9, 9, 256)  # os4 grid regardless of os8 trunk


def test_train_mode_updates_batch_stats(small_model):
    m, variables = small_model
    x = jnp.ones((2, 65, 65, 3))
    _, updates = m.apply(
        variables,
        x,
        train=True,
        deterministic=True,
        mutable=["batch_stats"],
    )
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(updates["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_gmmn_generator_shapes():
    g = GMMNGenerator(noise_dim=300, embed_dim=300, feature_dim=256)
    emb = jnp.ones((4, 10, 300))
    noise = jnp.zeros((4, 10, 300))
    variables = g.init(jax.random.key(0), emb, noise)
    out = g.apply(variables, emb, noise)
    assert out.shape == (4, 10, 256)
    assert np.all(np.asarray(out) >= 0)  # post-ReLU support


def test_graph_context_gmmn_masked_neighbors():
    g = GraphContextGMMN(feature_dim=64, hidden_dim=64, context_dim=32)
    emb = jnp.ones((5, 300))
    noise = jnp.zeros((5, 300))
    neigh = jnp.ones((5, 8, 300))
    mask = jnp.zeros((5, 8)).at[:, :2].set(1.0)
    variables = g.init(jax.random.key(0), emb, noise, neigh, mask)
    out = g.apply(variables, emb, noise, neigh, mask)
    assert out.shape == (5, 64)
    # changing masked-out neighbors must not change the output
    neigh2 = neigh.at[:, 5:].set(99.0)
    out2 = g.apply(variables, emb, noise, neigh2, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)
