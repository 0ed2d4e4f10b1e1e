"""LR schedules vs the reference formulas."""

import numpy as np
import pytest

from zs3_tpu.utils.schedules import build_schedule


def test_poly_matches_reference_formula():
    sched = build_schedule("poly", base_lr=0.007, total_steps=100, poly_power=0.9)
    for step in (0, 10, 50, 99):
        expected = 0.007 * (1 - step / 100) ** 0.9
        assert np.isclose(float(sched(step)), expected, rtol=1e-5), step


def test_warmup_ramps_linearly():
    sched = build_schedule("poly", 0.1, total_steps=100, warmup_steps=10)
    assert float(sched(0)) == 0.0
    assert np.isclose(float(sched(5)), 0.05, rtol=1e-5)
    assert np.isclose(float(sched(10)), 0.1, rtol=1e-2)


def test_cos_endpoints():
    sched = build_schedule("cos", 0.2, total_steps=50)
    assert np.isclose(float(sched(0)), 0.2)
    assert float(sched(50)) < 1e-6


def test_step_drop():
    sched = build_schedule("step", 0.3, total_steps=90)
    assert np.isclose(float(sched(0)), 0.3)
    assert np.isclose(float(sched(89)), 0.03, rtol=1e-5)


def test_const():
    sched = build_schedule("const", 0.5, total_steps=10)
    assert float(sched(9)) == 0.5


def test_unknown_raises():
    with pytest.raises(ValueError):
        build_schedule("exp", 0.1, 10)
