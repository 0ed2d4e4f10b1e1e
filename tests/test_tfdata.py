"""tf.data pipeline: shapes, dtypes, augmentation invariants."""

import numpy as np
import pytest
from PIL import Image

from zs3_tpu.core.config import DataConfig

tf = pytest.importorskip("tensorflow")


@pytest.fixture()
def voc_tree(tmp_path):
    base = tmp_path / "VOC2012"
    (base / "JPEGImages").mkdir(parents=True)
    (base / "SegmentationClass").mkdir()
    (base / "ImageSets" / "Segmentation").mkdir(parents=True)
    rng = np.random.default_rng(0)
    names = [f"img{i:03d}" for i in range(6)]
    for name in names:
        Image.fromarray(
            rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)
        ).save(base / "JPEGImages" / f"{name}.jpg")
        lbl = np.zeros((40, 50), np.uint8)
        lbl[5:15, 5:15] = 3
        Image.fromarray(lbl).save(base / "SegmentationClass" / f"{name}.png")
    with open(base / "ImageSets" / "Segmentation" / "train.txt", "w") as f:
        f.write("\n".join(names[:4]) + "\n")
    with open(base / "ImageSets" / "Segmentation" / "val.txt", "w") as f:
        f.write("\n".join(names[4:]) + "\n")
    return tmp_path


def test_tfdata_pipeline_batches(voc_tree):
    from zs3_tpu.data.tfdata import TFDataLoader
    from zs3_tpu.data.voc import VOCSegmentation

    cfg = DataConfig(
        dataset="pascal", root=str(voc_tree), crop_size=33, base_size=33,
        batch_size=2,
    )
    ds = VOCSegmentation(str(voc_tree), "train")
    loader = TFDataLoader(ds, cfg, seed=0)
    assert len(loader) == 2
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["image"].shape == (2, 33, 33, 3)
    assert b["image"].dtype == np.float32
    assert b["label"].shape == (2, 33, 33)
    assert b["label"].dtype == np.int32
    # labels only contain known classes + ignore fill
    vals = set(np.unique(np.concatenate([x["label"].ravel() for x in batches])))
    assert vals <= {0, 3, 255}
    # normalization applied: values roughly in [-3, 3]
    assert abs(b["image"]).max() < 4.0


def test_tfdata_epoch_reshuffle(voc_tree):
    from zs3_tpu.data.tfdata import TFDataLoader
    from zs3_tpu.data.voc import VOCSegmentation

    cfg = DataConfig(
        dataset="pascal", root=str(voc_tree), crop_size=33, base_size=33,
        batch_size=2,
    )
    loader = TFDataLoader(VOCSegmentation(str(voc_tree), "train"), cfg)
    loader.set_epoch(0)
    a = np.concatenate([b["image"] for b in loader])
    loader.set_epoch(1)
    b = np.concatenate([x["image"] for x in loader])
    assert not np.allclose(a, b)


def test_tfdata_same_epoch_is_deterministic(voc_tree):
    """Two iterations at the same set_epoch() produce bit-identical
    batches (stateless RNG keyed by (seed+epoch, example)) — the
    deterministic-resume guarantee on the tfdata path."""
    from zs3_tpu.data.tfdata import TFDataLoader
    from zs3_tpu.data.voc import VOCSegmentation

    cfg = DataConfig(
        dataset="pascal", root=str(voc_tree), crop_size=33, base_size=33,
        batch_size=2,
    )
    loader = TFDataLoader(VOCSegmentation(str(voc_tree), "train"), cfg, seed=7)
    loader.set_epoch(3)
    a_img = [b["image"] for b in loader]
    a_lbl = [b["label"] for b in loader]
    loader2 = TFDataLoader(VOCSegmentation(str(voc_tree), "train"), cfg, seed=7)
    loader2.set_epoch(3)
    for i, b in enumerate(loader2):
        np.testing.assert_array_equal(a_img[i], b["image"])
        np.testing.assert_array_equal(a_lbl[i], b["label"])


def test_tfdata_blur_applied(voc_tree):
    """The gaussian blur must actually run inside build_train_pipeline.

    Same seed, blur_prob 0 vs 1: every other stateless draw (flip,
    scale, crop, sigma) is identical, so the two pipelines differ ONLY
    by the blur conv.  Images must change (and lose high-frequency
    energy), labels must not — deleting the blur block or blurring the
    labels both fail here."""
    from zs3_tpu.data.tfdata import build_train_pipeline
    from zs3_tpu.data.voc import VOCSegmentation

    cfg = DataConfig(
        dataset="pascal", root=str(voc_tree), crop_size=33, base_size=33,
        batch_size=4,
    )
    ds = VOCSegmentation(str(voc_tree), "train")
    off = next(
        build_train_pipeline(ds, cfg, seed=0, blur_prob=0.0)
        .as_numpy_iterator()
    )
    on = next(
        build_train_pipeline(ds, cfg, seed=0, blur_prob=1.0)
        .as_numpy_iterator()
    )
    np.testing.assert_array_equal(off["label"], on["label"])
    assert not np.allclose(off["image"], on["image"])

    def hf_energy(img):  # mean squared discrete Laplacian
        lap = (
            4 * img[1:-1, 1:-1] - img[:-2, 1:-1] - img[2:, 1:-1]
            - img[1:-1, :-2] - img[1:-1, 2:]
        )
        return float(np.mean(lap**2))

    # Blur removes high-frequency energy on average over the batch.
    assert sum(hf_energy(i) for i in on["image"]) < sum(
        hf_energy(i) for i in off["image"]
    )


def test_make_data_loader_tfdata(voc_tree):
    from zs3_tpu.data.loader import make_data_loader

    cfg = DataConfig(
        dataset="pascal", root=str(voc_tree), crop_size=33, base_size=33,
        batch_size=2, eval_batch_size=2, input_pipeline="tfdata",
        num_workers=1,
    )
    train, val, n = make_data_loader(cfg)
    assert n == 21
    batch = next(iter(train))
    assert batch["image"].shape == (2, 33, 33, 3)
    vb = next(iter(val))
    assert vb["image"].shape == (2, 33, 33, 3)


@pytest.mark.slow
def test_tfdata_feeds_seen_trainer(voc_tree, tmp_path):
    """The tf.data pipeline must drive SeenTrainer end to end."""
    import dataclasses

    from zs3_tpu.core.config import Config, ModelConfig, TrainConfig
    from zs3_tpu.train.seen import SeenTrainer

    cfg = Config(
        model=ModelConfig(
            backbone="resnet50", num_classes=21, compute_dtype="float32",
            dropout=False,
        ),
        data=DataConfig(
            dataset="pascal", root=str(voc_tree), crop_size=33, base_size=33,
            batch_size=2, eval_batch_size=2, input_pipeline="tfdata",
            num_workers=1,
        ),
        train=TrainConfig(
            epochs=1, steps_per_epoch=2,
            checkpoint_dir=str(tmp_path / "run"), keep_checkpoints=1,
            mesh_axes=(("data", 1),),  # 4 train images -> batch 2 on 1 device
        ),
    )
    trainer = SeenTrainer(cfg)
    stats = trainer.train_epoch(0)
    assert np.isfinite(stats["train_loss"])
    report = trainer.validate(0)
    assert 0.0 <= report["miou"] <= 1.0


def test_tfdata_rejects_device_preprocess(voc_tree):
    """tfdata normalizes on the host; combining it with the device-side
    normalize step would double-normalize silently."""
    from zs3_tpu.data.loader import make_data_loader

    cfg = DataConfig(
        dataset="pascal", root=str(voc_tree), crop_size=33, base_size=33,
        batch_size=2, input_pipeline="tfdata", device_preprocess=True,
    )
    with pytest.raises(ValueError, match="device_preprocess"):
        make_data_loader(cfg)
