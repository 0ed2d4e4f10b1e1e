"""Metric logging + viz + profiling utilities."""

import json
import os

import numpy as np

from zs3_tpu.utils.logging import MetricLogger
from zs3_tpu.utils.profiling import StepTimer, force
from zs3_tpu.utils.viz import (
    decode_seg_map_sequence,
    decode_segmap,
    encode_segmap,
    get_pascal_labels,
)


def test_jsonl_logging(tmp_path):
    logger = MetricLogger(str(tmp_path))
    logger.log(1, {"loss": 0.5})
    logger.log(2, {"miou": 0.7}, prefix="val")
    lines = [json.loads(l) for l in open(logger.path)]
    assert lines[0]["loss"] == 0.5 and lines[0]["step"] == 1
    assert lines[1]["val/miou"] == 0.7


def test_pascal_palette_known_colors():
    pal = get_pascal_labels()
    np.testing.assert_array_equal(pal[0], [0, 0, 0])  # background
    np.testing.assert_array_equal(pal[1], [128, 0, 0])  # aeroplane
    np.testing.assert_array_equal(pal[15], [192, 128, 128])  # person


def test_decode_encode_roundtrip(rng):
    label = rng.integers(0, 21, (10, 12)).astype(np.uint8)
    rgb = decode_segmap(label, 21)
    back = encode_segmap(rgb)
    np.testing.assert_array_equal(back, label)


def test_decode_sequence_and_ignore():
    labels = np.zeros((2, 4, 4), np.int32)
    labels[0, 0, 0] = 255
    out = decode_seg_map_sequence(labels, 21)
    assert out.shape == (2, 4, 4, 3)
    np.testing.assert_array_equal(out[0, 0, 0], [0, 0, 0])


def test_step_timer_discards_warmup():
    """The slow first (warmup) step must not pollute the mean: with a
    0.2 s warmup step and 0.01 s steady steps, a mean anywhere near the
    all-steps average (~0.073 s) means warmup was counted."""
    timer = StepTimer(warmup=1)
    import time

    durations = [0.2, 0.01, 0.01]
    for d in durations:
        with timer:
            time.sleep(d)
    assert 0.005 < timer.mean < 0.05
    assert timer.steps_per_sec() > 0


def test_force_returns_scalar():
    import jax.numpy as jnp

    assert force({"a": jnp.asarray([3.0, 4.0])}) == 3.0
