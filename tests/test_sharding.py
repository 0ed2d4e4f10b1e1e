"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Validates the data-parallel story that replaces the reference's
DataParallel+SyncBN: batches sharded over the `data` axis, params
replicated, one jit train step with XLA-inserted collectives, and
numerics identical to single-device execution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from zs3_tpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
from zs3_tpu.core.mesh import batch_sharding, make_mesh, replicate, shard_batch
from zs3_tpu.models.deeplab import DeepLab
from zs3_tpu.train.seen import make_train_step
from zs3_tpu.train.state import create_seg_state
from zs3_tpu.utils.losses import build_seg_loss


def test_make_mesh_wildcard(mesh8):
    assert mesh8.shape == {"data": 8}
    with pytest.raises(ValueError):
        make_mesh((("a", -1), ("b", -1)))


def _tiny_state_and_batch(mesh, batch=8):
    cfg = Config(
        model=ModelConfig(
            backbone="resnet50", num_classes=3, compute_dtype="float32",
            dropout=False,
        ),
        data=DataConfig(dataset="synthetic", crop_size=33),
    )
    model = DeepLab(
        backbone="resnet50", num_classes=3, dropout=False, dtype=jnp.float32
    )
    state = create_seg_state(
        model, cfg, jax.random.key(0), (1, 33, 33, 3), total_steps=10
    )
    rng = np.random.default_rng(0)
    images = rng.standard_normal((batch, 33, 33, 3)).astype(np.float32)
    labels = rng.integers(0, 3, (batch, 33, 33)).astype(np.int32)
    return state, {"image": images, "label": labels}


@pytest.mark.slow
def test_sharded_train_step_runs(mesh8):
    state, batch = _tiny_state_and_batch(mesh8)
    state = replicate(state, mesh8)
    dev_batch = shard_batch(batch, mesh8)
    assert dev_batch["image"].sharding.spec == P("data")
    step = make_train_step(build_seg_loss("ce"), donate=False)
    new_state, out = step(state, dev_batch, jax.random.key(1))
    assert np.isfinite(float(out["loss"]))
    assert int(new_state.step) == 1


@pytest.mark.slow
def test_sharded_matches_single_device(mesh8):
    """Global-batch semantics: 8-way sharded grads == unsharded grads."""
    state, batch = _tiny_state_and_batch(mesh8)
    step = make_train_step(build_seg_loss("ce"), donate=False)

    # Single-device reference.
    s1, out1 = step(state, jax.tree.map(jnp.asarray, batch), jax.random.key(1))

    # Sharded run.
    state8 = replicate(state, mesh8)
    dev_batch = shard_batch(batch, mesh8)
    s8, out8 = step(state8, dev_batch, jax.random.key(1))

    np.testing.assert_allclose(float(out1["loss"]), float(out8["loss"]), rtol=1e-5)
    # Conv weight grads sum ~9k pixel contributions; the 8-way psum tree
    # reorders that f32 reduction, so updated params agree to ~1e-3, not
    # bitwise.  Loss (3e-7) and BN stats (1e-4, next test) pin semantics.
    l1 = jax.tree.leaves(s1.params)
    l8 = jax.tree.leaves(s8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


@pytest.mark.slow
def test_batch_stats_are_global_under_sharding(mesh8):
    """BN must see the global batch: sharded batch_stats == unsharded."""
    state, batch = _tiny_state_and_batch(mesh8)
    step = make_train_step(build_seg_loss("ce"), donate=False)
    s1, _ = step(state, jax.tree.map(jnp.asarray, batch), jax.random.key(1))
    s8, _ = step(replicate(state, mesh8), shard_batch(batch, mesh8), jax.random.key(1))
    for a, b in zip(jax.tree.leaves(s1.batch_stats), jax.tree.leaves(s8.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.slow
def test_int8_eval_runs_under_mesh(mesh8):
    """PTQ eval composes with data-parallel sharding.

    The trace-time quantized() context lowers eligible convs to
    s8 x s8 -> s32 regardless of input shardings; the lowering assert
    keeps the test non-vacuous (a scale-key mismatch silently runs
    float), and int8-vs-float agreement on identical inputs pins that
    quantization under the mesh matches the single-device contract
    (tests/test_quant.py owns the accuracy bars)."""
    from flax import traverse_util

    from zs3_tpu import quant
    from zs3_tpu.train.gmmn import extract_classifier, make_zs3_eval_step

    state, batch = _tiny_state_and_batch(mesh8)
    model = DeepLab(
        backbone="resnet50", num_classes=3, dropout=False, dtype=jnp.float32
    )
    trunk = {"params": state.params, "batch_stats": state.batch_stats}
    cls_params = extract_classifier(trunk)
    scales = quant.calibrate(
        model.apply, trunk, [batch["image"]], apply_kwargs={"train": False}
    )
    assert scales

    trunk_rep = replicate(trunk, mesh8)
    cls_rep = replicate(cls_params, mesh8)
    dev_batch = shard_batch(batch, mesh8)

    q_eval = make_zs3_eval_step(model, 3, 255)
    with quant.quantized(scales):
        lowered = q_eval.lower(trunk_rep, cls_rep, dev_batch)
        assert "xi8>" in lowered.as_text()
        conf_q = jax.device_get(q_eval(trunk_rep, cls_rep, dev_batch))
    n_px = batch["label"].size
    assert conf_q.shape == (3, 3) and int(conf_q.sum()) == n_px

    # Float reference on the same sharded inputs: with calibrated
    # scales the quantized confusion matrix must be nearly identical
    # (test_quant.py measures ~0.98 argmax agreement on random init).
    f_eval = make_zs3_eval_step(model, 3, 255)
    conf_f = jax.device_get(f_eval(trunk_rep, cls_rep, dev_batch))
    assert int(conf_f.sum()) == n_px
    moved = np.abs(conf_q.astype(np.int64) - conf_f.astype(np.int64)).sum()
    assert moved / n_px < 0.2, f"int8 moved {moved / n_px:.3f} of pixels"
