"""The release-rehearsal sanity bars must FAIL deliberately-broken runs.

VERDICT r4 weak #1 / round-5 task #2: "Done = a deliberately-broken run
(e.g. LR=0) FAILS the rehearsal."  The LR=0 no-op was measured once on
TPU (trained 0.0340 vs no-op 0.0067 mIoU, see assert_rehearsal_bars);
this test pins the bar logic itself against those measured failure
modes so a future edit cannot quietly re-vacuate the bars.  Pure dict
logic — milliseconds, quick tier.
"""

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
)

from release_rehearsal import assert_rehearsal_bars  # noqa: E402

# The driver-captured TPU artifact (REHEARSAL_r05.json metrics block):
# the canonical "healthy run" fixture.
GOOD = {
    "evaluate_miou": 0.0340,
    "evaluate_int8_miou": 0.0347,
    "int8_miou_delta": -0.0007,
    "qat_int8_miou": 0.0229,  # 0.1x-LR QAT keeps the trained level (full LR collapsed to 0.0006)
    "gmmn_tta_miou": 6.2e-07,
    "gmmn_tta_seen_miou": 7.0e-07,
    "gmmn_tta_unseen_miou": 0.0,  # structural on the fabricated tree
    "gmmn_tta_harmonic_miou": 0.0,
    "synthetic_seen_miou": 0.6041,
    "synthetic_zs3_unseen_miou": 0.0473,
    "synthetic_zs3_harmonic_miou": 0.0858,
    "synthetic_zs5_unseen_miou": 0.1059,
    "synthetic_zs5_harmonic_miou": 0.1711,
}
TPU = dict(seen_steps=25, zero_shot="full", on_tpu=True)


def test_healthy_tpu_artifact_passes():
    assert_rehearsal_bars(dict(GOOD), **TPU)


def test_lr0_noop_trainer_fails_seen_floor():
    # Measured on TPU @513² B4: --lr 0 evaluates at 0.0067 (only BN
    # stats move).  The floor (0.015) must catch it.
    broken = dict(GOOD, evaluate_miou=0.0067, int8_miou_delta=0.0001)
    with pytest.raises(AssertionError, match="learned nothing"):
        assert_rehearsal_bars(broken, **TPU)


def test_qat_collapse_fails():
    # Measured r5: the QAT stage at the FULL base LR (two fresh-momentum
    # steps) damaged the trained weights, 0.034 -> 0.0006 through the
    # int8 protocol; the rehearsal now fine-tunes at 0.1x LR and this
    # bar catches the regression mode.
    broken = dict(GOOD, qat_int8_miou=0.0006)
    with pytest.raises(AssertionError, match="QAT fine-tune damaged"):
        assert_rehearsal_bars(broken, **TPU)


def test_zero_unseen_transfer_fails():
    # r4's structural failure (unseen=0.0) must no longer pass.
    broken = dict(GOOD, synthetic_zs3_unseen_miou=0.0,
                  synthetic_zs3_harmonic_miou=0.0)
    with pytest.raises(AssertionError, match="zero-shot transfer below"):
        assert_rehearsal_bars(broken, **TPU)


def test_broken_int8_protocol_fails():
    broken = dict(GOOD, evaluate_int8_miou=0.30, int8_miou_delta=-0.266)
    with pytest.raises(AssertionError, match="int8 protocol diverged"):
        assert_rehearsal_bars(broken, **TPU)


def test_nonfinite_metric_fails():
    broken = dict(GOOD, gmmn_tta_miou=float("nan"))
    with pytest.raises(AssertionError, match="non-finite"):
        assert_rehearsal_bars(broken, **TPU)


def test_cpu_smoke_mode_skips_depth_gated_bars():
    # The CPU quick chain runs 1-2 steps (seen floor is meaningless)
    # and zero_shot="smoke" (transfer bars need acceptance depth) —
    # but the universal invariants (finite, >=0, int8 delta) still bind.
    shallow = dict(GOOD, evaluate_miou=0.0009,
                   synthetic_zs3_unseen_miou=0.0)
    assert_rehearsal_bars(
        shallow, seen_steps=1, zero_shot="smoke", on_tpu=False
    )
    with pytest.raises(AssertionError, match="int8 protocol diverged"):
        assert_rehearsal_bars(
            dict(shallow, int8_miou_delta=0.2),
            seen_steps=1, zero_shot="smoke", on_tpu=False,
        )
