"""ZS5Net self-training: pseudo-label generation + weak-label retrain."""

import os

import jax
import numpy as np
import pytest
from PIL import Image

from zs3_tpu.core.config import (
    Config,
    DataConfig,
    GMMNConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from zs3_tpu.data.synthetic import SyntheticSegmentation
from zs3_tpu.models.deeplab import DeepLab
from zs3_tpu.train.self_training import (
    WeakLabelDataset,
    ZS5Trainer,
    generate_pseudo_labels,
)

import jax.numpy as jnp


@pytest.fixture()
def zs5_cfg(tmp_path):
    return Config(
        model=ModelConfig(
            backbone="resnet50", num_classes=6, compute_dtype="float32",
            dropout=False,
        ),
        gmmn=GMMNConfig(
            embed_dim=32, noise_dim=16, hidden_dim=32, pixels_per_class=32
        ),
        data=DataConfig(
            dataset="synthetic", crop_size=65, base_size=65,
            batch_size=8, eval_batch_size=8, unseen_classes=(2,),
        ),
        train=TrainConfig(
            epochs=1, steps_per_epoch=2,
            checkpoint_dir=str(tmp_path / "run"), keep_checkpoints=1,
        ),
    )


def test_generate_pseudo_labels(tmp_path):
    ds = SyntheticSegmentation(8, (65, 65), num_classes=6, seed=3)
    model = DeepLab(backbone="resnet50", num_classes=6, dropout=False)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 65, 65, 3)))
    out_dir = str(tmp_path / "pseudo")
    n = generate_pseudo_labels(model, variables, ds, (2,), out_dir, size=65)
    # only images containing class 2 get pseudo-labels
    expected = sum(1 for i in range(8) if (ds[i]["label"] == 2).any())
    assert n == expected and n > 0
    for i in range(8):
        sample = ds[i]
        path = os.path.join(out_dir, sample["name"] + ".png")
        if not (sample["label"] == 2).any():
            assert not os.path.exists(path)
            continue
        pseudo = np.asarray(Image.open(path))
        gt = sample["label"]
        # seen pixels keep GT exactly
        np.testing.assert_array_equal(pseudo[gt != 2], gt[gt != 2])
        # unseen pixels are re-labeled from the allowed (unseen) set only
        assert np.all(np.isin(pseudo[gt == 2], [2]))


def test_weak_label_dataset_override(tmp_path):
    ds = SyntheticSegmentation(4, (33, 33), num_classes=4, seed=0)
    weak_dir = tmp_path / "weak"
    weak_dir.mkdir()
    fake = np.full((33, 33), 3, np.uint8)
    Image.fromarray(fake).save(weak_dir / (ds.names[1] + ".png"))
    wrapped = WeakLabelDataset(ds, str(weak_dir))
    np.testing.assert_array_equal(wrapped[1]["label"], fake)
    np.testing.assert_array_equal(wrapped[0]["label"], ds[0]["label"])


def test_zs5_trainer_end_to_end(zs5_cfg):
    t = ZS5Trainer(zs5_cfg)
    n = t.pseudo_label()
    assert n > 0
    files = os.listdir(t.pseudo_dir)
    assert len(files) == n
    stats = t.train_epoch(0)
    assert np.isfinite(stats["mmd"])
    report = t.validate(0)
    assert "harmonic_miou" in report
