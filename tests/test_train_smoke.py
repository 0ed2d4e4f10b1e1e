"""End-to-end smoke: SeenTrainer on synthetic data, tiny shapes, CPU.

This is BASELINE.json config 1's "CPU-runnable" guarantee: the full
train->validate->checkpoint loop must run without TPUs or datasets.
"""

import numpy as np
import pytest

from zs3_tpu.core.config import (
    Config,
    DataConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from zs3_tpu.train.seen import SeenTrainer

pytestmark = pytest.mark.slow  # trainer e2e: quick tier skips (-m 'not slow')


@pytest.fixture()
def tiny_cfg(tmp_path):
    return Config(
        model=ModelConfig(
            backbone="resnet50",
            num_classes=4,
            compute_dtype="float32",
            dropout=False,
        ),
        data=DataConfig(
            dataset="synthetic",
            crop_size=65,
            base_size=65,
            batch_size=8,
            eval_batch_size=8,
        ),
        optim=OptimConfig(lr=0.01),
        train=TrainConfig(
            epochs=1,
            steps_per_epoch=2,
            checkpoint_dir=str(tmp_path / "run"),
            keep_checkpoints=1,
        ),
    )


def test_seen_trainer_end_to_end(tiny_cfg):
    trainer = SeenTrainer(tiny_cfg)
    stats = trainer.train_epoch(0)
    assert np.isfinite(stats["train_loss"])
    report = trainer.validate(0)
    assert 0.0 <= report["miou"] <= 1.0
    assert int(trainer.state.step) == 2


def test_loss_decreases_over_steps(tiny_cfg):
    cfg = tiny_cfg.replace(
        train=tiny_cfg.train.__class__(
            epochs=4,
            steps_per_epoch=4,
            checkpoint_dir=tiny_cfg.train.checkpoint_dir,
            eval_interval=100,  # skip validation
            keep_checkpoints=1,
        )
    )
    trainer = SeenTrainer(cfg)
    first = trainer.train_epoch(0)["train_loss"]
    for e in range(1, 4):
        last = trainer.train_epoch(e)["train_loss"]
    assert last < first, f"loss did not decrease: {first} -> {last}"


def test_finetune_resume_resets_step(tiny_cfg):
    import dataclasses
    import jax

    from zs3_tpu.utils.saver import Saver

    trainer = SeenTrainer(tiny_cfg)
    trainer.train_epoch(0)
    trainer.validate(0)
    latest = Saver.latest_checkpoint(trainer.saver.directory)

    ft_cfg = tiny_cfg.replace(
        train=dataclasses.replace(tiny_cfg.train, resume=latest, finetune=True)
    )
    ft = SeenTrainer(ft_cfg)
    assert int(jax.device_get(ft.state.step)) == 0  # fresh optimizer
    # but weights came from the checkpoint
    import numpy as np

    a = jax.tree.leaves(jax.device_get(trainer.state.params))[0]
    b = jax.tree.leaves(jax.device_get(ft.state.params))[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    full_cfg = tiny_cfg.replace(
        train=dataclasses.replace(tiny_cfg.train, resume=latest, finetune=False)
    )
    full = SeenTrainer(full_cfg)
    assert int(jax.device_get(full.state.step)) == 2  # optimizer state restored


def test_device_preprocess_path(tiny_cfg):
    """uint8 batches + on-device normalize/flip must train equivalently."""
    import dataclasses

    cfg = tiny_cfg.replace(
        data=dataclasses.replace(tiny_cfg.data, device_preprocess=True)
    )
    trainer = SeenTrainer(cfg)
    batch = next(iter(trainer.train_loader))
    assert batch["image"].dtype == np.uint8  # host ships raw bytes
    stats = trainer.train_epoch(0)
    assert np.isfinite(stats["train_loss"])
    # eval path still normalizes on host
    report = trainer.validate(0)
    assert 0.0 <= report["miou"] <= 1.0


def test_tensorboard_panels(tiny_cfg, tmp_path):
    """TB-enabled validation writes scalar + image events without error."""
    import dataclasses
    import glob
    import os

    cfg = tiny_cfg.replace(
        train=dataclasses.replace(tiny_cfg.train, tensorboard=True)
    )
    trainer = SeenTrainer(cfg)
    trainer.train_epoch(0)
    trainer.validate(0)
    tb_files = glob.glob(os.path.join(trainer.saver.directory, "tb", "*"))
    assert tb_files, "no tensorboard event files written"
    assert os.path.exists(os.path.join(trainer.saver.directory, "metrics.jsonl"))


def test_resume_is_bit_deterministic(tiny_cfg):
    """Train 2 epochs straight vs 1 epoch -> checkpoint -> resume -> 1
    epoch: identical parameters (step-indexed RNG + seeded epoch order).
    """
    import dataclasses
    import jax

    from zs3_tpu.utils.saver import Saver

    base = dataclasses.replace(
        tiny_cfg.train, epochs=2, steps_per_epoch=2, eval_interval=100
    )

    # straight-through run
    t1 = SeenTrainer(tiny_cfg.replace(train=base))
    t1.train_epoch(0)
    t1.train_epoch(1)

    # checkpointed + resumed run
    t2 = SeenTrainer(tiny_cfg.replace(train=base))
    t2.train_epoch(0)
    t2.saver.save_checkpoint(t2.state, 2, 0.0)
    ckpt = Saver.latest_checkpoint(t2.saver.directory)
    t3 = SeenTrainer(
        tiny_cfg.replace(train=dataclasses.replace(base, resume=ckpt))
    )
    t3.train_epoch(1)

    a = jax.tree.leaves(jax.device_get(t1.state.params))
    b = jax.tree.leaves(jax.device_get(t3.state.params))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_feature_grid_loss_trains(tiny_cfg):
    import dataclasses

    cfg = tiny_cfg.replace(
        optim=dataclasses.replace(tiny_cfg.optim, loss_at="feature")
    )
    trainer = SeenTrainer(cfg)
    stats = trainer.train_epoch(0)
    assert np.isfinite(stats["train_loss"])
    report = trainer.validate(0)
    assert 0.0 <= report["miou"] <= 1.0


def test_no_val_fit_still_checkpoints(tiny_cfg):
    """--no-val (eval_interval never reached) must still persist the
    final state — checkpoints were previously only written inside
    validate()."""
    import dataclasses
    import os

    from zs3_tpu.utils.saver import Saver

    cfg = tiny_cfg.replace(
        train=dataclasses.replace(tiny_cfg.train, eval_interval=10**9)
    )
    trainer = SeenTrainer(cfg)
    trainer.fit()
    ckpt = Saver.latest_checkpoint(trainer.saver.directory)
    assert ckpt is not None and os.path.isdir(ckpt)


def test_resume_preserves_best_metric(tiny_cfg):
    """A resumed run must not let a worse validation re-point 'best'."""
    import dataclasses

    from zs3_tpu.utils.saver import Saver

    trainer = SeenTrainer(tiny_cfg)
    trainer.train_epoch(0)
    trainer.best_metric = 0.9  # as if a great validation happened
    path = trainer.saver.save_checkpoint(
        trainer.state, 2, trainer.best_metric, is_best=True
    )
    meta = Saver.read_meta(path)
    assert meta["best_metric"] == 0.9
    # read_meta through the best symlink resolves to the same sidecar
    best = Saver.best_checkpoint(trainer.saver.directory)
    assert Saver.read_meta(best)["best_metric"] == 0.9

    cfg2 = tiny_cfg.replace(
        train=dataclasses.replace(tiny_cfg.train, resume=path)
    )
    resumed = SeenTrainer(cfg2)
    assert resumed.best_metric == 0.9

    # A post-resume validation that scores WORSE than the restored best
    # (mIoU of a barely-trained model << 0.9) must not mark itself best:
    # no 'best' symlink may appear in the resumed experiment.
    report = resumed.validate(0)
    assert report["miou"] < 0.9
    assert resumed.best_metric == 0.9
    assert Saver.best_checkpoint(resumed.saver.directory) is None
    assert Saver.latest_checkpoint(resumed.saver.directory) is not None
