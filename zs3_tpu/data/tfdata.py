"""Optional tf.data input pipeline (production path).

The reference feeds GPUs from torch DataLoader workers (reference:
zs3/dataloaders/__init__.py make_data_loader).  The threaded python
loader (zs3_tpu.data.loader) is the dependency-light default; this
module provides the TPU-idiomatic high-throughput alternative: tf.data
with parallel JPEG/PNG decode, the same augmentation semantics, fused
shuffle/batch/prefetch, all on the host CPU — TF is used for IO only and
never touches the accelerator (device placement is explicitly disabled).

Gated import: everything here degrades to an ImportError with a clear
message if tensorflow is absent.

Augmentation parity with transforms.py's train composition: random
hflip -> random scale [0.5, 2.0] -> pad(fill=ignore) -> random crop ->
gaussian blur (p=0.5, sigma~U[0,1], separable 7-tap; the reference
blurs via PIL whose radius parameter plays the same sigma role) ->
normalize.

Determinism: every random draw is a tf.random.stateless_* op keyed by
(seed+epoch, example_index) — two iterations at the same set_epoch()
produce bit-identical batches, so the framework's deterministic-resume
guarantee holds on this input path too (the reference's torch
transforms are seed-controllable; the python loader here already keys
its rng by (seed, epoch, index)).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from zs3_tpu.core.config import DataConfig
from zs3_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD


def _require_tf():
    try:
        import tensorflow as tf
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "zs3_tpu.data.tfdata requires tensorflow; use the default "
            "python loader (zs3_tpu.data.loader) instead"
        ) from e
    tf.config.set_visible_devices([], "GPU")
    try:
        tf.config.set_visible_devices([], "TPU")
    except Exception:
        pass
    return tf


def _file_lists(dataset) -> Tuple[list, list]:
    """Pull (image_path, label_path) lists out of a zs3_tpu dataset."""
    import os

    images, labels = [], []
    for name in dataset.names:
        images.append(os.path.join(dataset.image_dir, name + ".jpg"))
        labels.append(dataset._label_path(name))
    return images, labels


def build_train_pipeline(
    dataset,
    cfg: DataConfig,
    seed: int = 0,
    blur_prob: float = 0.5,
):
    """tf.data.Dataset of {'image': f32 NHWC, 'label': i32 NHW} batches.

    blur_prob overrides the reference's p=0.5 gaussian-blur gate; tests
    pin it to 0/1 to exercise the real blur path deterministically.
    """
    tf = _require_tf()
    images, labels = _file_lists(dataset)
    crop = cfg.crop_size
    base = cfg.base_size
    fill = cfg.ignore_index

    ds = tf.data.Dataset.from_tensor_slices(
        (images, labels, np.arange(len(images), dtype=np.int32))
    )
    # One shuffle per pipeline build (TFDataLoader rebuilds per epoch
    # with seed+epoch), so epoch order is a pure function of the seed.
    ds = ds.shuffle(len(images), seed=seed, reshuffle_each_iteration=False)

    def load_and_augment(img_path, lbl_path, idx):
        def draw(j, minval=0.0, maxval=1.0):
            """Stateless U[minval,maxval) keyed by (seed, example, slot)."""
            return tf.random.stateless_uniform(
                (), seed=tf.stack([tf.constant(seed, tf.int32), idx * 8 + j]),
                minval=minval, maxval=maxval, dtype=tf.float32,
            )

        img = tf.io.decode_image(
            tf.io.read_file(img_path), channels=3, expand_animations=False
        )
        lbl = tf.io.decode_png(tf.io.read_file(lbl_path), channels=1)
        lbl = lbl[..., 0]
        # random horizontal flip (joint)
        do_flip = draw(0) < 0.5
        img = tf.cond(do_flip, lambda: img[:, ::-1], lambda: img)
        lbl = tf.cond(do_flip, lambda: lbl[:, ::-1], lambda: lbl)
        # random scale of the short side into [0.5, 2.0] * base
        shape = tf.shape(img)
        h, w = shape[0], shape[1]
        short = tf.cast(
            draw(1, float(int(base * 0.5)), float(int(base * 2.0) + 1)),
            tf.int32,
        )
        short_f = tf.cast(short, tf.float32)
        hf, wf = tf.cast(h, tf.float32), tf.cast(w, tf.float32)
        scale = tf.where(h > w, short_f / wf, short_f / hf)
        nh = tf.cast(hf * scale, tf.int32)
        nw = tf.cast(wf * scale, tf.int32)
        img = tf.image.resize(img[None], (nh, nw), method="bilinear")[0]
        lbl = tf.image.resize(
            tf.cast(lbl, tf.float32)[None, ..., None], (nh, nw), method="nearest"
        )[0, ..., 0]
        # pad to at least crop with fill=ignore on labels, 0 on image
        ph = tf.maximum(crop - nh, 0)
        pw = tf.maximum(crop - nw, 0)
        img = tf.pad(img, [[0, ph], [0, pw], [0, 0]])
        lbl = tf.pad(lbl, [[0, ph], [0, pw]], constant_values=float(fill))
        # joint random crop (stateless offsets)
        oy = tf.cast(
            draw(2) * tf.cast(tf.maximum(nh + ph - crop, 0) + 1, tf.float32),
            tf.int32,
        )
        ox = tf.cast(
            draw(3) * tf.cast(tf.maximum(nw + pw - crop, 0) + 1, tf.float32),
            tf.int32,
        )
        img = img[oy : oy + crop, ox : ox + crop]
        lbl = lbl[oy : oy + crop, ox : ox + crop]
        img = tf.ensure_shape(img, (crop, crop, 3))
        lbl = tf.ensure_shape(lbl, (crop, crop))
        # gaussian blur, p=0.5, sigma ~ U[0,1] (python loader:
        # random_gaussian_blur).  sigma=0 degenerates to the identity
        # kernel, so the no-blur branch needs no tf.cond.
        sigma = tf.where(draw(4) < blur_prob, draw(5), 0.0)
        xs = tf.range(-3.0, 4.0)
        k = tf.exp(-(xs * xs) / (2.0 * sigma * sigma + 1e-12))
        k = k / tf.reduce_sum(k)
        kh = tf.tile(k[:, None, None, None], (1, 1, 3, 1))
        kw = tf.tile(k[None, :, None, None], (1, 1, 3, 1))
        blurred = tf.nn.depthwise_conv2d(
            img[None], kh, strides=[1, 1, 1, 1], padding="SAME"
        )
        blurred = tf.nn.depthwise_conv2d(
            blurred, kw, strides=[1, 1, 1, 1], padding="SAME"
        )[0]
        img = blurred
        # normalize (ImageNet)
        img = img / 255.0
        img = (img - tf.constant(IMAGENET_MEAN)) / tf.constant(IMAGENET_STD)
        return {"image": img, "label": tf.cast(lbl, tf.int32)}

    ds = ds.map(load_and_augment, num_parallel_calls=tf.data.AUTOTUNE)
    ds = ds.batch(cfg.batch_size, drop_remainder=True)
    ds = ds.prefetch(tf.data.AUTOTUNE)
    return ds


def as_numpy_iterator(tf_dataset):
    """Yield numpy batch dicts (what the trainers consume)."""
    for batch in tf_dataset.as_numpy_iterator():
        yield batch


class TFDataLoader:
    """Adapter exposing the DataLoader interface over a tf.data pipeline."""

    def __init__(self, dataset, cfg: DataConfig, seed: int = 0):
        self._dataset = dataset
        self._cfg = cfg
        self._seed = seed
        self._epoch = 0
        self.dataset = dataset

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def __len__(self) -> int:
        return len(self._dataset) // self._cfg.batch_size

    def __iter__(self):
        pipeline = build_train_pipeline(
            self._dataset, self._cfg, seed=self._seed + self._epoch
        )
        return as_numpy_iterator(pipeline)
