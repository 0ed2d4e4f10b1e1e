"""Host transforms: shapes, fill semantics, determinism, torch-free."""

import numpy as np
import pytest

from zs3_tpu.data import transforms as T


@pytest.fixture()
def sample(rng):
    return {
        "image": rng.integers(0, 255, (40, 60, 3)).astype(np.uint8),
        "label": rng.integers(0, 5, (40, 60)).astype(np.uint8),
    }


def test_random_scale_crop_shapes_and_fill(sample):
    rng = np.random.default_rng(0)
    out = T.random_scale_crop(sample, rng, base_size=48, crop_size=48, fill=255)
    assert out["image"].shape == (48, 48, 3)
    assert out["label"].shape == (48, 48)
    # labels may contain the fill value but never other out-of-range ids
    assert set(np.unique(out["label"])) <= set(range(5)) | {255}


def test_random_scale_crop_deterministic(sample):
    a = T.random_scale_crop(sample, np.random.default_rng(3), 48, 48)
    b = T.random_scale_crop(sample, np.random.default_rng(3), 48, 48)
    np.testing.assert_array_equal(a["image"], b["image"])


def test_fix_scale_crop_center(sample):
    out = T.fix_scale_crop(sample, crop_size=32)
    assert out["image"].shape == (32, 32, 3)


def test_fix_scale_crop_geometry():
    """Short side scales to crop_size and the crop is CENTERED.

    40h x 60w input, crop 32: short side 40 -> 32, so width becomes 48
    and the center crop keeps columns 8..40.  A half/half label pattern
    must therefore split exactly down the output's middle — a top-left
    crop (24/8 split) or long-side scaling (out-of-range crop) fails.
    """
    label = np.zeros((40, 60), np.uint8)
    label[:, 30:] = 1
    s = {"image": np.zeros((40, 60, 3), np.uint8), "label": label}
    out = T.fix_scale_crop(s, crop_size=32)
    assert out["label"].shape == (32, 32)
    assert (out["label"][:, :16] == 0).all()
    assert (out["label"][:, 16:] == 1).all()


def test_fixed_resize(sample):
    out = T.fixed_resize(sample, 24)
    assert out["image"].shape == (24, 24, 3)
    assert out["label"].shape == (24, 24)


def test_letterbox_preserves_aspect_ratio():
    """40h x 80w at size 32: long side 80 -> 32, so content is 16x32 and
    rows 16.. are ImageNet-mean padding (which normalizes to zero)."""
    image = np.full((40, 80, 3), 200, np.uint8)
    canvas, (ch, cw) = T.letterbox_image(image, 32)
    assert canvas.shape == (32, 32, 3) and (ch, cw) == (16, 32)
    assert (canvas[:16] == 200).all()
    mean_px = np.round(T.IMAGENET_MEAN * 255.0).astype(np.uint8)
    np.testing.assert_array_equal(canvas[16:], np.broadcast_to(mean_px, (16, 32, 3)))
    norm = T.normalize({"image": canvas, "label": np.zeros((32, 32), np.uint8)})
    assert np.abs(norm["image"][16:]).max() < 0.02  # padding ~ 0 after normalize


def test_letterbox_roundtrip_halves():
    """A left/right half-split label survives letterbox -> predict-like
    identity -> unletterbox with the split in the right place (a squash
    or a mis-anchored crop moves it)."""
    image = np.zeros((20, 40, 3), np.uint8)
    image[:, 20:] = 255
    canvas, content = T.letterbox_image(image, 16)
    # identity "prediction": 1 where the canvas is bright
    pred = (canvas[..., 0] > 127).astype(np.uint8)
    out = T.unletterbox_pred(pred, content, (20, 40))
    assert out.shape == (20, 40)
    assert (out[:, :20] == 0).all() and (out[:, 20:] == 1).all()


def test_letterbox_square_equals_plain_resize():
    """Square inputs must behave exactly as before (no padding)."""
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
    canvas, content = T.letterbox_image(image, 24)
    assert content == (24, 24)
    plain = T.fixed_resize(
        {"image": image, "label": np.zeros((48, 48), np.uint8)}, 24
    )["image"]
    np.testing.assert_array_equal(canvas, plain)


def test_hflip(sample):
    rng = np.random.default_rng(0)
    flipped = None
    for seed in range(10):
        out = T.random_horizontal_flip(sample, np.random.default_rng(seed))
        if not np.array_equal(out["image"], sample["image"]):
            flipped = out
            break
    assert flipped is not None
    np.testing.assert_array_equal(flipped["image"], sample["image"][:, ::-1])
    np.testing.assert_array_equal(flipped["label"], sample["label"][:, ::-1])


def test_rotate_fills_label(sample):
    # find a seed with a visibly nonzero rotation angle
    filled = False
    for seed in range(20):
        out = T.random_rotate(sample, np.random.default_rng(seed), degree=30, fill=255)
        assert out["label"].shape == sample["label"].shape
        if 255 in np.unique(out["label"]):  # corners filled with ignore
            filled = True
            break
    assert filled


def test_normalize():
    s = {
        "image": np.full((4, 4, 3), 255, np.uint8),
        "label": np.ones((4, 4), np.uint8),
    }
    out = T.normalize(s)
    expected = (1.0 - T.IMAGENET_MEAN) / T.IMAGENET_STD
    np.testing.assert_allclose(out["image"][0, 0], expected, rtol=1e-5)
    assert out["label"].dtype == np.int32


def test_train_transform_pipeline(sample):
    out = T.train_transform(sample, np.random.default_rng(0), 48, 48)
    assert out["image"].shape == (48, 48, 3)
    assert out["image"].dtype == np.float32


def test_device_batched_normalize():
    import jax.numpy as jnp

    imgs = jnp.full((2, 4, 4, 3), 255, jnp.uint8)
    out = T.batched_normalize_device(imgs)
    expected = (1.0 - T.IMAGENET_MEAN) / T.IMAGENET_STD
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), expected, rtol=1e-5)


def test_device_batched_flip():
    import jax
    import jax.numpy as jnp

    imgs = jnp.arange(2 * 2 * 3 * 1, dtype=jnp.float32).reshape(2, 2, 3, 1)
    lbls = jnp.arange(2 * 2 * 3, dtype=jnp.int32).reshape(2, 2, 3)
    out_i, out_l = T.batched_random_flip_device(imgs, lbls, jax.random.key(0))
    flips = np.asarray(
        jax.random.bernoulli(jax.random.key(0), 0.5, (2,))
    )
    for b in range(2):
        # Image and label must flip TOGETHER (a mismatch silently
        # destroys spatial correspondence under device_preprocess).
        if flips[b]:
            np.testing.assert_array_equal(
                np.asarray(out_l[b]), np.asarray(lbls[b, :, ::-1])
            )
            np.testing.assert_array_equal(
                np.asarray(out_i[b]), np.asarray(imgs[b, :, ::-1])
            )
        else:
            np.testing.assert_array_equal(np.asarray(out_l[b]), np.asarray(lbls[b]))
            np.testing.assert_array_equal(np.asarray(out_i[b]), np.asarray(imgs[b]))
