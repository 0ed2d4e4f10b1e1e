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
