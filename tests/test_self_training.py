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
        # labeled (seen-GT) pixels keep GT exactly
        np.testing.assert_array_equal(pseudo[gt != 2], gt[gt != 2])
        # unlabeled pixels carry the model's restricted prediction:
        # any seen class or the image's unseen tags (never other unseen)
        assert np.all(np.isin(pseudo[gt == 2], [0, 1, 2, 3, 4, 5]))


class _StubDataset:
    """Minimal dataset stub with externally-supplied images/labels."""

    def __init__(self, images, labels, num_classes):
        self.images, self.labels = images, labels
        self.NUM_CLASSES = num_classes
        self.names = [f"img_{i:03d}" for i in range(len(images))]

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        return {
            "image": self.images[i],
            "label": self.labels[i],
            "name": self.names[i],
        }


def test_pseudo_labels_never_read_unseen_gt_values(tmp_path):
    """The weak protocol grants image-level tags only: permuting the
    unseen class ids inside the GT regions (same tag set, same
    labeled/unlabeled partition) must not change the pseudo-labels.
    The old leaky implementation copied each region's unseen id into the
    allowed-set restriction per pixel and would fail this test."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (65, 65, 3), dtype=np.uint8)
    gt_a = np.zeros((65, 65), np.uint8)
    gt_a[5:25, 5:25] = 2
    gt_a[35:60, 30:60] = 4
    gt_a[0:5, 40:64] = 1  # a seen object
    gt_b = gt_a.copy()
    gt_b[gt_a == 2] = 4
    gt_b[gt_a == 4] = 2  # swap the unseen ids; tags {2,4} unchanged
    model = DeepLab(backbone="resnet50", num_classes=6, dropout=False)
    variables = model.init(jax.random.key(1), jnp.zeros((1, 65, 65, 3)))
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    ds_a = _StubDataset([img], [gt_a], 6)
    ds_b = _StubDataset([img], [gt_b], 6)
    assert generate_pseudo_labels(model, variables, ds_a, (2, 4), out_a, size=65) == 1
    assert generate_pseudo_labels(model, variables, ds_b, (2, 4), out_b, size=65) == 1
    pa = np.asarray(Image.open(os.path.join(out_a, "img_000.png")))
    pb = np.asarray(Image.open(os.path.join(out_b, "img_000.png")))
    np.testing.assert_array_equal(pa, pb)
    # and the seen object's GT survives in both
    np.testing.assert_array_equal(pa[gt_a == 1], gt_a[gt_a == 1])


def test_pseudo_labels_confidence_threshold(tmp_path):
    """An impossible threshold (>1) turns every unlabeled pixel into
    ignore; threshold 0 labels them all."""
    ds = SyntheticSegmentation(4, (65, 65), num_classes=6, seed=3)
    model = DeepLab(backbone="resnet50", num_classes=6, dropout=False)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 65, 65, 3)))
    out_dir = str(tmp_path / "pseudo_conf")
    n = generate_pseudo_labels(
        model, variables, ds, (2,), out_dir, size=65, confidence=2.0
    )
    assert n > 0
    for i in range(4):
        sample = ds[i]
        path = os.path.join(out_dir, sample["name"] + ".png")
        if not os.path.exists(path):
            continue
        pseudo = np.asarray(Image.open(path))
        gt = sample["label"]
        assert np.all(pseudo[gt == 2] == 255)
        np.testing.assert_array_equal(pseudo[gt != 2], gt[gt != 2])


def test_weak_label_dataset_override(tmp_path):
    ds = SyntheticSegmentation(4, (33, 33), num_classes=4, seed=0)
    weak_dir = tmp_path / "weak"
    weak_dir.mkdir()
    fake = np.full((33, 33), 3, np.uint8)
    Image.fromarray(fake).save(weak_dir / (ds.names[1] + ".png"))
    wrapped = WeakLabelDataset(ds, str(weak_dir))
    np.testing.assert_array_equal(wrapped[1]["label"], fake)
    np.testing.assert_array_equal(wrapped[0]["label"], ds[0]["label"])


@pytest.mark.slow
def test_zs5_trainer_end_to_end(zs5_cfg):
    t = ZS5Trainer(zs5_cfg)
    # ZS5 runs the fused step in self-training mode (real unseen
    # features reach the classifier CE and the MMD targets).
    assert t.cfg.gmmn.self_training
    n = t.pseudo_label()
    assert n > 0
    files = os.listdir(t.pseudo_dir)
    assert len(files) == n
    stats = t.train_epoch(0)
    assert np.isfinite(stats["mmd"])
    report = t.validate(0)
    assert "harmonic_miou" in report


def test_gt_view_undoes_weak_label_override(tmp_path):
    """Stage A must read the REAL annotation even when the train dataset
    was built with weak_label_dir set (rerunning train-zs5 with an
    existing pseudo dir must not treat old pseudo PNGs as GT)."""
    from zs3_tpu.train.self_training import _gt_view

    ds = SyntheticSegmentation(4, (16, 16), num_classes=4, seed=1)
    pseudo_dir = str(tmp_path / "pseudo")
    os.makedirs(pseudo_dir)
    # Fabricate a stale pseudo PNG for every image.
    for i in range(4):
        name = ds[i]["name"]
        Image.fromarray(np.full((16, 16), 3, np.uint8)).save(
            os.path.join(pseudo_dir, name + ".png")
        )

    wrapped = WeakLabelDataset(ds, pseudo_dir)
    assert (wrapped[0]["label"] == 3).all()  # override active
    clean = _gt_view(wrapped)
    np.testing.assert_array_equal(clean[0]["label"], ds[0]["label"])

    # VOC-style: dataset with its own weak_label_dir attribute.
    class FakeVOC:
        weak_label_dir = pseudo_dir
        names = ["a"]

        def __getitem__(self, i):
            return {"label": "weak" if self.weak_label_dir else "gt"}

    v = FakeVOC()
    assert _gt_view(v)[0]["label"] == "gt"
    assert v.weak_label_dir == pseudo_dir  # original untouched

    # CombineDBs-style union wrapping the weak dataset.
    class FakeUnion:
        def __init__(self, sub):
            self._items = [(sub, 0)]

        def __getitem__(self, i):
            sub, j = self._items[i]
            return sub[j]

    u = FakeUnion(FakeVOC())
    assert _gt_view(u)[0]["label"] == "gt"


@pytest.mark.slow
def test_zs5_int8_features_pseudo_label_and_step(zs5_cfg):
    """--int8-features in the ZS5 stage: pseudo-labeling AND the fused
    retrain step both run with quantized trunk convs (inherited from
    GMMNTrainer; the retrained classifier stays float by the exclusion
    rule) and produce a working chain."""
    import dataclasses

    cfg = zs5_cfg.replace(
        train=dataclasses.replace(zs5_cfg.train, int8_features=True)
    )
    t = ZS5Trainer(cfg)
    assert t._int8_scales, "trunk calibration at construction"
    n = t.pseudo_label()
    assert n > 0 and len(os.listdir(t.pseudo_dir)) == n
    stats = t.train_epoch(0)
    assert np.isfinite(stats["mmd"]) and np.isfinite(stats["cls_ce"])
