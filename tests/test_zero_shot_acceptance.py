"""End-to-end zero-shot transfer acceptance test.

THE north-star property of the framework (reference de-facto
validation: seen/unseen/harmonic mIoU tables, SURVEY.md §6 /
BASELINE.json config 3): training a GMMN on SEEN-class features and
retraining the classifier on generated UNSEEN-class features must lift
unseen-class IoU well above chance on pixels the trunk never saw a
label for.

The synthetic dataset makes this testable without VOC on disk: each
class's appearance (RGB tint) is an exactly-linear function of the
class embedding the GMMN conditions on (zs3_tpu.data.synthetic), so
embedding->feature transfer is well-posed.  This test fails if any link
of the chain — feature extraction, per-class sampling, MMD training,
classifier retrain, splice, seen/unseen metric split — stops working.

Reference curve (CPU, 8 virtual devices, this exact config): seen-mIoU
~0.53 after the supervised stage; unseen-mIoU 0.000 before GMMN
training, then ~0.10 @ 30 epochs, ~0.15 @ 40, ~0.24 @ 80.  Thresholds
below sit at roughly half the expected values.
"""

import dataclasses

import jax
import numpy as np
import pytest

from zs3_tpu.core.config import (
    Config,
    DataConfig,
    GMMNConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)


@pytest.mark.slow
def test_zero_shot_transfer_end_to_end(tmp_path):
    from zs3_tpu.train.gmmn import GMMNTrainer
    from zs3_tpu.train.seen import SeenTrainer

    cfg = Config(
        model=ModelConfig(
            backbone="resnet50", num_classes=10, compute_dtype="float32",
            dropout=False,
        ),
        gmmn=GMMNConfig(
            embed_dim=8, noise_dim=8, hidden_dim=128, pixels_per_class=64,
        ),
        data=DataConfig(
            dataset="synthetic", crop_size=49, base_size=49,
            batch_size=8, eval_batch_size=8, unseen_classes=(3, 5),
            synthetic_classes=10, synthetic_items=32,
            synthetic_embed_dim=8, synthetic_tint_weight=1.0,
        ),
        optim=OptimConfig(lr=0.02, gmmn_lr=1e-3, classifier_lr=1e-2),
        train=TrainConfig(
            epochs=20, eval_interval=10**9,
            checkpoint_dir=str(tmp_path / "run"), keep_checkpoints=1,
        ),
    )

    # Stage 1: supervised training on seen classes only (the loader
    # filters unseen classes out of the train pool).
    seen = SeenTrainer(cfg)
    for e in range(cfg.train.epochs):
        seen.train_epoch(e)
    seen_report = seen.validate(cfg.train.epochs - 1)
    assert seen_report["seen_miou"] > 0.35, (
        f"supervised stage failed to learn: {seen_report}"
    )
    # Unseen classes were never trained: no transfer yet.
    assert seen_report["unseen_miou"] < 0.02
    variables = jax.device_get(
        {"params": seen.state.params, "batch_stats": seen.state.batch_stats}
    )

    # Stage 2: GMMN + classifier retrain (the zero-shot step).
    gcfg = cfg.replace(train=dataclasses.replace(cfg.train, epochs=45))
    t = GMMNTrainer(gcfg, seg_variables=variables)
    for e in range(gcfg.train.epochs):
        t.train_epoch(e)
    report = t.validate(gcfg.train.epochs - 1)

    # Transfer: unseen IoU must rise well above its pre-GMMN value (0)
    # and above chance, with seen classes retained.
    assert report["unseen_miou"] > 0.06, (
        f"zero-shot transfer failed: {report}"
    )
    assert report["harmonic_miou"] > 0.10, (
        f"harmonic mIoU did not rise: {report}"
    )
    assert report["seen_miou"] > 0.30, (
        f"classifier retrain destroyed seen classes: {report}"
    )
    assert np.isfinite(report["miou"])
