"""Confusion matrix / Evaluator vs hand-computed numpy oracles.

Mirrors the reference's metric semantics (zs3/utils/metrics.py
Evaluator) including ignore_index handling and the ZS3 seen/unseen/
harmonic split.
"""

import jax.numpy as jnp
import numpy as np

from zs3_tpu.metrics.evaluator import Evaluator, iou_from_confusion
from zs3_tpu.ops.confusion import confusion_matrix


def _np_confusion(gt, pred, num_classes, ignore=255):
    mask = (gt != ignore) & (gt >= 0) & (gt < num_classes)
    idx = num_classes * gt[mask].astype(int) + pred[mask].astype(int)
    return np.bincount(idx, minlength=num_classes**2).reshape(
        num_classes, num_classes
    )


def test_confusion_matches_numpy(rng):
    gt = rng.integers(0, 6, (4, 17, 17)).astype(np.int32)
    gt[0, :3] = 255  # ignore region
    pred = rng.integers(0, 6, (4, 17, 17)).astype(np.int32)
    ours = np.asarray(confusion_matrix(jnp.asarray(gt), jnp.asarray(pred), 6))
    np.testing.assert_array_equal(ours, _np_confusion(gt, pred, 6))


def test_confusion_all_ignored():
    gt = np.full((2, 4, 4), 255, np.int32)
    pred = np.zeros((2, 4, 4), np.int32)
    conf = np.asarray(confusion_matrix(jnp.asarray(gt), jnp.asarray(pred), 3))
    assert conf.sum() == 0


def test_iou_and_harmonic():
    # 3 classes; construct a known confusion matrix.
    conf = np.array([[50, 5, 0], [10, 30, 0], [0, 0, 0]], np.float64)
    iou = iou_from_confusion(conf)
    assert np.isclose(iou[0], 50 / (55 + 60 - 50))  # tp/(gt+pred-tp)
    assert np.isnan(iou[2])  # absent from both gt and pred

    ev = Evaluator(3, unseen_classes=(1,))
    ev.add_confusion(jnp.asarray(conf, dtype=jnp.float32))
    rep = ev.compute()
    s = iou[0]  # class 2 absent -> nanmean over class 0 only
    u = iou[1]
    assert np.isclose(rep.seen_miou, s)
    assert np.isclose(rep.unseen_miou, u)
    assert np.isclose(rep.harmonic_miou, 2 * s * u / (s + u))


def test_evaluator_streaming_equals_single_shot(rng):
    ev1 = Evaluator(5)
    ev2 = Evaluator(5)
    gts, preds = [], []
    for _ in range(3):
        gt = rng.integers(0, 5, (2, 9, 9)).astype(np.int32)
        pred = rng.integers(0, 5, (2, 9, 9)).astype(np.int32)
        ev1.add_batch(jnp.asarray(gt), jnp.asarray(pred))
        gts.append(gt)
        preds.append(pred)
    ev2.add_batch(
        jnp.asarray(np.concatenate(gts)), jnp.asarray(np.concatenate(preds))
    )
    np.testing.assert_array_equal(ev1.confusion, ev2.confusion)
    assert np.isclose(ev1.compute().miou, ev2.compute().miou)


def test_pixel_accuracy():
    gt = np.array([[0, 1], [1, 255]], np.int32)
    pred = np.array([[0, 0], [1, 1]], np.int32)
    ev = Evaluator(2)
    ev.add_batch(jnp.asarray(gt), jnp.asarray(pred))
    rep = ev.compute()
    assert np.isclose(rep.pixel_accuracy, 2 / 3)


def test_confusion_shape_validation():
    import pytest

    with pytest.raises(ValueError):
        confusion_matrix(jnp.zeros((2, 3)), jnp.zeros((2, 4)), 5)
