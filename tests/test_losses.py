"""Segmentation losses vs torch oracles (ignore_index semantics)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from zs3_tpu.utils.losses import (
    calculate_class_weights,
    cross_entropy_loss,
    focal_loss,
)


def test_ce_matches_torch_with_ignore(rng):
    logits = rng.standard_normal((2, 9, 9, 5)).astype(np.float32)
    labels = rng.integers(0, 5, (2, 9, 9)).astype(np.int32)
    labels[0, :2] = 255
    ours = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    ref = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels).long(),
        ignore_index=255,
    ).item()
    assert np.isclose(ours, ref, rtol=1e-5)


def test_ce_class_weights_match_torch(rng):
    logits = rng.standard_normal((2, 7, 7, 4)).astype(np.float32)
    labels = rng.integers(0, 4, (2, 7, 7)).astype(np.int32)
    labels[1, 3:] = 255
    w = rng.random(4).astype(np.float32) + 0.5
    ours = float(
        cross_entropy_loss(
            jnp.asarray(logits), jnp.asarray(labels), class_weights=jnp.asarray(w)
        )
    )
    ref = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels).long(),
        weight=torch.from_numpy(w),
        ignore_index=255,
    ).item()
    assert np.isclose(ours, ref, rtol=1e-5)


def test_focal_reduces_easy_example_weight(rng):
    logits = np.zeros((1, 2, 2, 3), np.float32)
    logits[..., 0] = 5.0  # confident class 0
    labels = np.zeros((1, 2, 2), np.int32)
    fl = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels)))
    ce = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert fl < ce  # easy examples downweighted


def test_all_ignored_is_zero():
    logits = np.ones((1, 2, 2, 3), np.float32)
    labels = np.full((1, 2, 2), 255, np.int32)
    assert float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels))) == 0.0


def test_class_weights_formula():
    hist = jnp.asarray([100.0, 0.0, 900.0])
    w = np.asarray(calculate_class_weights(hist))
    np.testing.assert_allclose(
        w, 1.0 / np.log(1.02 + np.array([0.1, 0.0, 0.9])), rtol=1e-4
    )


def test_compute_dataset_class_weights(tmp_path, rng):
    from zs3_tpu.data.synthetic import SyntheticSegmentation
    from zs3_tpu.utils.losses import compute_dataset_class_weights
    import numpy as np

    ds = SyntheticSegmentation(8, (16, 16), num_classes=4, seed=0)
    cache = str(tmp_path / "hist.npy")
    w1 = compute_dataset_class_weights(ds, 4, cache_path=cache)
    assert w1.shape == (4,)
    # cache round trip gives identical weights
    w2 = compute_dataset_class_weights(ds, 4, cache_path=cache)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    # The histogram must actually count pixels (an all-zero histogram
    # would yield constant weights and pass a >= ordering check).
    hist = np.load(cache)
    assert hist.sum() > 0
    # Rarer classes get STRICTLY larger weights (frequencies differ on
    # this synthetic split, so equality means the balancing is broken).
    order_by_freq = np.argsort(hist)
    assert hist[order_by_freq[0]] < hist[order_by_freq[-1]]
    w = np.asarray(w1)
    assert w[order_by_freq[0]] > w[order_by_freq[-1]]
