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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_spatial_train_step_matches_single_device(tmp_path):
    """TRAINING under the dp x sp layout: backward halo exchanges and
    cross-axis grad/BN reductions must reproduce single-device numerics
    (resolution scale-out training, beyond the reference's DP-only
    world)."""
    from zs3_tpu.core.config import Config, DataConfig, ModelConfig
    from zs3_tpu.parallel.spatial import spatially_sharded_train_step
    from zs3_tpu.train.seen import make_train_step
    from zs3_tpu.train.state import create_seg_state
    from zs3_tpu.utils.losses import build_seg_loss
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = Config(
        model=ModelConfig(
            backbone="resnet50", num_classes=5, compute_dtype="float32",
            dropout=False,
        ),
        data=DataConfig(dataset="synthetic", crop_size=64),
    )
    from zs3_tpu.models.deeplab import build_deeplab

    model = build_deeplab(cfg.model)
    state = create_seg_state(
        model, cfg, jax.random.key(0), (1, 64, 64, 3), total_steps=10
    )
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    lab = rng.integers(0, 5, (2, 64, 64)).astype(np.int32)
    loss_fn = build_seg_loss("ce")
    key = jax.random.key(7)

    ref_step = make_train_step(loss_fn, donate=False)
    ref_state, ref_out = ref_step(
        state, {"image": jnp.asarray(x), "label": jnp.asarray(lab)}, key
    )

    mesh = make_mesh((("data", 2), ("space", 4)))
    sp_step = spatially_sharded_train_step(loss_fn, mesh, donate=False)
    rep = NamedSharding(mesh, P())
    state_r = jax.device_put(state, rep)
    batch = {
        "image": jax.device_put(
            jnp.asarray(x), spatial_batch_sharding(mesh)
        ),
        "label": jax.device_put(
            jnp.asarray(lab), NamedSharding(mesh, P("data", "space", None))
        ),
    }
    sp_state, sp_out = sp_step(state_r, batch, key)

    np.testing.assert_allclose(
        float(sp_out["loss"]), float(ref_out["loss"]), atol=1e-5
    )
    # parameters after one SGD step: reduction-order drift only
    ref_leaves = jax.tree.leaves(jax.device_get(ref_state.params))
    sp_leaves = jax.tree.leaves(jax.device_get(sp_state.params))
    worst = max(
        float(np.max(np.abs(a - b))) for a, b in zip(ref_leaves, sp_leaves)
    )
    assert worst < 5e-3, f"param drift {worst}"
    # BN stats kept global-batch semantics
    ref_bn = jax.tree.leaves(jax.device_get(ref_state.batch_stats))
    sp_bn = jax.tree.leaves(jax.device_get(sp_state.batch_stats))
    worst_bn = max(
        float(np.max(np.abs(a - b))) for a, b in zip(ref_bn, sp_bn)
    )
    assert worst_bn < 1e-3, f"bn drift {worst_bn}"
