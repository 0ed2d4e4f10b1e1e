"""Per-class fixed-budget sampling and adjacency-graph ops."""

import jax
import jax.numpy as jnp
import numpy as np

from zs3_tpu.ops.sampling import (
    class_adjacency,
    downsample_labels,
    neighbor_lists_from_adjacency,
    sample_class_pixels,
)


def test_sampling_masks_and_membership(rng):
    n, d, c, budget = 200, 8, 5, 16
    feats = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, c, (n,)).astype(np.int32))
    gathered, mask = sample_class_pixels(feats, labels, c, budget, jax.random.key(0))
    assert gathered.shape == (c, budget, d)
    assert mask.shape == (c, budget)
    lab_np = np.asarray(labels)
    feats_np = np.asarray(feats)
    for cls in range(c):
        count = int((lab_np == cls).sum())
        assert int(mask[cls].sum()) == min(count, budget)
        # every valid gathered row must be a real feature of that class
        valid_rows = np.asarray(gathered[cls])[np.asarray(mask[cls]) > 0]
        class_feats = feats_np[lab_np == cls]
        for row in valid_rows:
            assert np.any(np.all(np.isclose(row, class_feats, atol=1e-6), axis=1))


def test_sampling_no_replacement(rng):
    """With budget >= population, each class pixel appears exactly once."""
    n, d, c = 64, 4, 2
    feats = jnp.asarray(np.arange(n * d).reshape(n, d).astype(np.float32))
    labels = jnp.asarray((np.arange(n) % c).astype(np.int32))
    gathered, mask = sample_class_pixels(feats, labels, c, 64, jax.random.key(1))
    for cls in range(c):
        rows = np.asarray(gathered[cls])[np.asarray(mask[cls]) > 0]
        uniq = np.unique(rows[:, 0])
        assert len(uniq) == rows.shape[0] == n // c


def test_sampling_absent_class():
    feats = jnp.ones((10, 3))
    labels = jnp.zeros((10,), jnp.int32)  # only class 0 present
    gathered, mask = sample_class_pixels(feats, labels, 4, 8, jax.random.key(0))
    assert float(mask[1:].sum()) == 0.0
    np.testing.assert_array_equal(np.asarray(gathered[1:]), 0.0)


def test_ignore_label_never_sampled():
    feats = jnp.ones((10, 3))
    labels = jnp.full((10,), 255, jnp.int32)
    _, mask = sample_class_pixels(feats, labels, 4, 8, jax.random.key(0))
    assert float(mask.sum()) == 0.0


def test_downsample_labels():
    labels = jnp.asarray(np.arange(16).reshape(1, 4, 4) % 3)
    out = downsample_labels(labels, (2, 2))
    assert out.shape == (1, 2, 2)


def test_downsample_labels_values_and_aspect():
    """Nearest semantics on a rectangular grid: values must come from
    the source (never blended) and the (H, W) axes must not be swapped.
    Quadrant labels 4h x 8w -> 2 x 4 keeps the left/right split at
    column 2."""
    lbl = np.zeros((1, 4, 8), np.int32)
    lbl[:, :2, :4] = 1  # top-left
    lbl[:, :2, 4:] = 2  # top-right
    lbl[:, 2:, :4] = 3  # bottom-left
    lbl[:, 2:, 4:] = 4  # bottom-right
    out = np.asarray(downsample_labels(jnp.asarray(lbl), (2, 4)))
    assert out.shape == (1, 2, 4)
    np.testing.assert_array_equal(out[0, 0, :2], [1, 1])
    np.testing.assert_array_equal(out[0, 0, 2:], [2, 2])
    np.testing.assert_array_equal(out[0, 1, :2], [3, 3])
    np.testing.assert_array_equal(out[0, 1, 2:], [4, 4])
    assert set(np.unique(out)) <= {1, 2, 3, 4}  # no blending


def test_class_adjacency_simple():
    # two vertical stripes: class 1 | class 2, touching along one column
    lbl = np.zeros((1, 4, 4), np.int32)
    lbl[:, :, :2] = 1
    lbl[:, :, 2:] = 2
    adj = np.asarray(class_adjacency(jnp.asarray(lbl), 4))
    assert adj[1, 2] == 4  # 4 touching rows
    assert adj[2, 1] == 4
    assert adj[1, 1] == 0  # diagonal zeroed
    assert adj[0, 3] == 0


def test_class_adjacency_ignores_255():
    lbl = np.full((1, 3, 3), 255, np.int64)
    lbl[0, 0, 0] = 1
    adj = np.asarray(class_adjacency(jnp.asarray(lbl), 4))
    assert adj.sum() == 0.0


def test_neighbor_lists():
    adj = jnp.asarray(
        np.array([[0, 5, 1, 0], [5, 0, 0, 0], [1, 0, 0, 0], [0, 0, 0, 0]], np.float32)
    )
    nb, mask = neighbor_lists_from_adjacency(adj, 2)
    assert nb.shape == (4, 2)
    assert list(np.asarray(nb[0])) == [1, 2]
    np.testing.assert_array_equal(np.asarray(mask[0]), [1.0, 1.0])
    assert float(mask[3].sum()) == 0.0  # isolated class


def test_per_image_adjacency_isolated_scenes():
    """Classes adjacent only within their own image, never across."""
    import jax.numpy as jnp

    from zs3_tpu.ops.sampling import per_image_adjacency

    lbl = np.zeros((2, 4, 4), np.int32)
    lbl[0, :, :2] = 1
    lbl[0, :, 2:] = 2  # image 0: 1|2 touch
    lbl[1, :, :2] = 3
    lbl[1, :, 2:] = 0  # image 1: 3|0 touch
    adj = np.asarray(per_image_adjacency(jnp.asarray(lbl), 4))
    assert adj.shape == (2, 4, 4)
    assert adj[0, 1, 2] > 0 and adj[0, 3, 0] == 0
    assert adj[1, 3, 0] > 0 and adj[1, 1, 2] == 0


def test_sample_class_pixels_indices(rng):
    import jax

    feats = jnp.asarray(np.arange(40, dtype=np.float32).reshape(20, 2))
    labels = jnp.asarray((np.arange(20) % 2).astype(np.int32))
    gathered, mask, idx = sample_class_pixels(
        feats, labels, 2, 8, jax.random.key(0), return_indices=True
    )
    idx_np = np.asarray(idx)
    for cls in range(2):
        valid = np.asarray(mask[cls]) > 0
        # indices point at pixels of the right class
        assert np.all(np.asarray(labels)[idx_np[cls][valid]] == cls)
        # gathered rows equal feats at those indices
        np.testing.assert_array_equal(
            np.asarray(gathered[cls])[valid], np.asarray(feats)[idx_np[cls][valid]]
        )
