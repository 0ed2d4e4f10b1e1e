"""Mesh/sharding helper units (pad_eval_batch, shard_batch, replicate)."""

import jax.numpy as jnp
import numpy as np
import pytest

from zs3_tpu.core.mesh import (
    make_mesh,
    pad_eval_batch,
    pad_to_multiple,
    replicate,
    shard_batch,
)


def test_pad_to_multiple():
    assert pad_to_multiple(5, 8) == 8
    assert pad_to_multiple(8, 8) == 8
    assert pad_to_multiple(0, 8) == 0


def test_pad_eval_batch_inert_rows():
    batch = {
        "image": np.ones((3, 4, 4, 3), np.float32),
        "label": np.full((3, 4, 4), 2, np.int32),
    }
    out = pad_eval_batch(batch, 8, ignore_index=255)
    assert out["image"].shape[0] == 8
    assert out["label"].shape[0] == 8
    # padded labels are all-ignore; padded images zero
    np.testing.assert_array_equal(out["label"][3:], 255)
    np.testing.assert_array_equal(out["image"][3:], 0.0)
    # original rows untouched
    np.testing.assert_array_equal(out["label"][:3], batch["label"])


def test_pad_eval_batch_noop_when_aligned():
    batch = {"image": np.zeros((8, 2, 2, 3)), "label": np.zeros((8, 2, 2))}
    out = pad_eval_batch(batch, 8)
    assert out is batch


def test_shard_and_replicate(mesh8):
    batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
    dev = shard_batch(batch, mesh8)
    assert dev["x"].sharding.num_devices == 8
    np.testing.assert_array_equal(np.asarray(dev["x"]), batch["x"])
    rep = replicate({"w": np.ones((3,))}, mesh8)
    assert rep["w"].sharding.num_devices == 8
    assert rep["w"].sharding.is_fully_replicated


@pytest.mark.slow
def test_two_level_dcn_data_mesh_trains():
    """SURVEY §5: the mesh spec must take a 2-level (dcn, ici) layout
    without touching call sites.  Batch sharded over BOTH axes
    (P(('dcn','data'))) — the multi-pod data-parallel layout — must
    train identically to plain dp: XLA emits the grad all-reduce as a
    two-level reduction, params stay replicated."""
    import jax

    from zs3_tpu.core.config import Config, DataConfig, ModelConfig
    from zs3_tpu.models.deeplab import DeepLab
    from zs3_tpu.train.seen import make_train_step
    from zs3_tpu.train.state import create_seg_state
    from zs3_tpu.utils.losses import build_seg_loss

    mesh2 = make_mesh((("dcn", 2), ("data", 4)))
    cfg = Config(
        model=ModelConfig(backbone="resnet50", num_classes=4,
                          compute_dtype="float32", dropout=False),
        data=DataConfig(dataset="synthetic", crop_size=33),
    )
    model = DeepLab(backbone="resnet50", num_classes=4, dropout=False,
                    dtype=jnp.float32)
    state = create_seg_state(
        model, cfg, jax.random.key(0), (1, 33, 33, 3), total_steps=10
    )
    rng = np.random.default_rng(0)
    batch_np = {
        "image": rng.standard_normal((8, 33, 33, 3)).astype(np.float32),
        "label": rng.integers(0, 4, (8, 33, 33)).astype(np.int32),
    }
    step = make_train_step(build_seg_loss("ce"), donate=False)

    # two-level sharding
    state2 = replicate(state, mesh2)
    batch2 = shard_batch(batch_np, mesh2, axis=("dcn", "data"))
    new2, out2 = step(state2, batch2, jax.random.key(1))

    # single-device oracle
    new1, out1 = step(state, batch_np, jax.random.key(1))

    assert np.isfinite(float(out2["loss"]))
    np.testing.assert_allclose(
        float(out2["loss"]), float(out1["loss"]), rtol=1e-5
    )
    # updated conv params agree up to cross-device reduction-order drift
    k2 = np.asarray(
        jax.device_get(new2.params["decoder"]["classifier"]["conv"]["kernel"])
    )
    k1 = np.asarray(
        jax.device_get(new1.params["decoder"]["classifier"]["conv"]["kernel"])
    )
    np.testing.assert_allclose(k2, k1, atol=2e-3)


def test_make_mesh_subset_and_errors():
    # subsetting to fewer devices than available is allowed
    assert make_mesh((("a", 5),)).shape == {"a": 5}
    with pytest.raises(ValueError):
        make_mesh((("a", 16),))  # more than available


def test_prefetch_to_device(mesh8):
    from zs3_tpu.core.mesh import prefetch_to_device

    batches = [
        {"image": np.full((8, 2, 2, 3), i, np.float32)} for i in range(5)
    ]
    out = list(prefetch_to_device(iter(batches), mesh8, depth=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert b["image"].sharding.num_devices == 8
        np.testing.assert_array_equal(np.asarray(b["image"]), batches[i]["image"])
