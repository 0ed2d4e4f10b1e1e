"""Spatial sharding: XLA-partitioned convs must match unsharded numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zs3_tpu.core.mesh import make_mesh
from zs3_tpu.models.deeplab import DeepLab
from zs3_tpu.parallel.spatial import (
    spatial_batch_sharding,
    spatially_sharded_forward,
)


@pytest.fixture(scope="module")
def model_and_vars():
    m = DeepLab(backbone="resnet50", num_classes=5, dropout=False)
    x = jnp.zeros((1, 64, 64, 3))
    return m, m.init(jax.random.key(0), x)


def test_space_only_mesh_matches_single_device(model_and_vars):
    m, variables = model_and_vars
    mesh = make_mesh((("space", 8),))
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)

    ref = m.apply(variables, jnp.asarray(x), train=False)
    fwd = spatially_sharded_forward(m, mesh, data_axis=None)
    xs = jax.device_put(jnp.asarray(x), spatial_batch_sharding(mesh, None))
    out = fwd(variables, xs)
    assert out.sharding.spec == spatial_batch_sharding(mesh, None).spec
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_data_by_space_mesh(model_and_vars):
    """2-way data x 4-way spatial hybrid — the dp+sp layout."""
    m, variables = model_and_vars
    mesh = make_mesh((("data", 2), ("space", 4)))
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 64, 64, 3)).astype(np.float32)
    ref = m.apply(variables, jnp.asarray(x), train=False)
    fwd = spatially_sharded_forward(m, mesh)
    xs = jax.device_put(jnp.asarray(x), spatial_batch_sharding(mesh))
    out = fwd(variables, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
