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


def test_summarize_trace_fabricated(tmp_path):
    """summarize_trace aggregates device-lane events by hlo_category
    with per-step division, skipping program spans and host lanes."""
    import gzip
    import json

    from zs3_tpu.utils.profiling import summarize_trace

    d = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    d.mkdir(parents=True)
    events = [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 2, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        # program span must be skipped (would double-count)
        {"ph": "X", "pid": 1, "name": "jit_train_step(123)", "dur": 99999,
         "args": {"hlo_category": "?"}},
        {"ph": "X", "pid": 1, "name": "convolution.1", "dur": 4000,
         "args": {"hlo_category": "convolution fusion",
                  "model_flops": "2000000000", "raw_bytes_accessed": "1000"}},
        {"ph": "X", "pid": 1, "name": "fusion.2", "dur": 2000,
         "args": {"hlo_category": "convolution fusion",
                  "model_flops": "1000000000", "raw_bytes_accessed": "500"}},
        {"ph": "X", "pid": 1, "name": "loop.3", "dur": 1000,
         "args": {"hlo_category": "loop fusion"}},
        # host-lane event must be ignored
        {"ph": "X", "pid": 2, "name": "dispatch", "dur": 777,
         "args": {"hlo_category": "loop fusion"}},
    ]
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)

    out = summarize_trace(str(tmp_path), steps=2)
    assert list(out) == ["convolution fusion", "loop fusion"]
    conv = out["convolution fusion"]
    assert conv["ms"] == 3.0          # (4000+2000)us / 2 steps
    assert conv["gflops"] == 1.5      # 3e9 / 2
    assert conv["ops"] == 1.0         # 2 ops / 2 steps
    assert out["loop fusion"]["ms"] == 0.5
    # absent / empty logdir -> {}
    assert summarize_trace(str(tmp_path / "nope")) == {}
