"""Dataset readers against a fabricated on-disk VOCdevkit/SBD/Context tree."""

import os

import numpy as np
import pytest
from PIL import Image
from scipy import io as sio

from zs3_tpu.core.config import DataConfig
from zs3_tpu.data.classes import CONTEXT_CLASSES, VOC_CLASSES, seen_classes
from zs3_tpu.data.embeddings import load_class_embeddings
from zs3_tpu.data.loader import DataLoader, collate, make_data_loader
from zs3_tpu.data.sbd import CombineDBs, SBDSegmentation
from zs3_tpu.data.synthetic import SyntheticSegmentation
from zs3_tpu.data.voc import VOCSegmentation


@pytest.fixture()
def voc_tree(tmp_path):
    """Fabricate a minimal VOC2012 layout: 6 images, 2 contain class 10."""
    base = tmp_path / "VOC2012"
    (base / "JPEGImages").mkdir(parents=True)
    (base / "SegmentationClass").mkdir()
    (base / "ImageSets" / "Segmentation").mkdir(parents=True)
    rng = np.random.default_rng(0)
    names = [f"img{i:03d}" for i in range(6)]
    for i, name in enumerate(names):
        img = rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)
        Image.fromarray(img).save(base / "JPEGImages" / f"{name}.jpg")
        lbl = np.zeros((40, 50), np.uint8)
        lbl[5:15, 5:15] = 1
        if i < 2:
            lbl[20:30, 20:30] = 10  # unseen class (cow)
        lbl[0, 0] = 255
        Image.fromarray(lbl).save(base / "SegmentationClass" / f"{name}.png")
    with open(base / "ImageSets" / "Segmentation" / "train.txt", "w") as f:
        f.write("\n".join(names[:4]) + "\n")
    with open(base / "ImageSets" / "Segmentation" / "val.txt", "w") as f:
        f.write("\n".join(names[4:]) + "\n")
    return tmp_path


def test_voc_reader_and_unseen_filter(voc_tree):
    ds = VOCSegmentation(str(voc_tree), "train", unseen_classes=(10,))
    # img000/img001 contain class 10 and must be filtered out
    assert len(ds) == 2
    sample = ds[0]
    assert sample["image"].shape == (40, 50, 3)
    assert sample["label"].shape == (40, 50)
    # no filtering on val
    val = VOCSegmentation(str(voc_tree), "val", unseen_classes=(10,),
                          filter_unseen=False)
    assert len(val) == 2


def test_voc_weak_label_fallback(voc_tree, tmp_path):
    weak = tmp_path / "weak"
    weak.mkdir()
    pseudo = np.full((40, 50), 7, np.uint8)
    Image.fromarray(pseudo).save(weak / "img000.png")
    ds = VOCSegmentation(
        str(voc_tree), "train", unseen_classes=(10,),
        filter_unseen=False, weak_label_dir=str(weak),
    )
    by_name = {ds.names[i]: i for i in range(len(ds))}
    np.testing.assert_array_equal(ds[by_name["img000"]]["label"], pseudo)
    # img002 has no weak file -> GT fallback
    assert (ds[by_name["img002"]]["label"] == 1).any()


@pytest.fixture()
def sbd_tree(tmp_path):
    base = tmp_path / "benchmark_RELEASE" / "dataset"
    (base / "img").mkdir(parents=True)
    (base / "cls").mkdir()
    rng = np.random.default_rng(1)
    names = [f"sbd{i:03d}" for i in range(3)]
    for name in names:
        img = rng.integers(0, 255, (30, 30, 3), dtype=np.uint8)
        Image.fromarray(img).save(base / "img" / f"{name}.jpg")
        seg = np.zeros((30, 30), np.uint8)
        seg[10:20, 10:20] = 2
        gtcls = np.zeros((1, 1), dtype=object)
        sio.savemat(
            base / "cls" / f"{name}.mat",
            {"GTcls": {"Segmentation": seg}},
        )
    with open(base / "train.txt", "w") as f:
        f.write("\n".join(names) + "\n")
    return tmp_path


def test_sbd_reader(sbd_tree):
    ds = SBDSegmentation(str(sbd_tree), "train")
    assert len(ds) == 3
    sample = ds[0]
    assert sample["label"].shape == (30, 30)
    assert (sample["label"] == 2).sum() == 100


def test_combine_dbs_dedup(voc_tree):
    a = VOCSegmentation(str(voc_tree), "train", filter_unseen=False)
    b = VOCSegmentation(str(voc_tree), "train", filter_unseen=False)
    combined = CombineDBs([a, b], exclude_names=["img000"])
    # duplicates collapsed, img000 excluded
    assert sorted(combined.names) == ["img001", "img002", "img003"]


def test_synthetic_context_tint_mode():
    """context_tint blends each visible region's tint with its touching
    neighbors' tints (same relation ops/sampling.py::class_adjacency
    measures); labels are unchanged and, at tint_weight=1.0, region
    pixels equal the blend formula exactly (uint8 rounding aside)."""
    from zs3_tpu.data.synthetic import synthetic_class_tints

    ct = 0.5
    plain = SyntheticSegmentation(
        8, (64, 64), num_classes=6, seed=5, tint_weight=1.0
    )
    ctx = SyntheticSegmentation(
        8, (64, 64), num_classes=6, seed=5, tint_weight=1.0, context_tint=ct
    )
    tints = synthetic_class_tints(6, 32).astype(np.float64)
    changed = 0
    for i in range(8):
        a, b = plain[i], ctx[i]
        np.testing.assert_array_equal(a["label"], b["label"])
        lbl = b["label"]
        # independent touching-set computation (shifted comparisons)
        touch = {int(c): set() for c in np.unique(lbl)}
        for u, v in ((lbl[:, :-1], lbl[:, 1:]), (lbl[:-1, :], lbl[1:, :])):
            d = u != v
            for x, y in zip(u[d].ravel(), v[d].ravel()):
                touch[int(x)].add(int(y))
                touch[int(y)].add(int(x))
        for c, nbs in touch.items():
            if c == 0 or not nbs:
                continue
            expect = (1 - ct) * tints[c] + ct * np.mean(
                tints[sorted(nbs)], axis=0
            )
            got = b["image"][lbl == c].mean(axis=0)
            np.testing.assert_allclose(got, expect, atol=1.0)
            if not np.array_equal(
                a["image"][lbl == c], b["image"][lbl == c]
            ):
                changed += 1
    assert changed > 0  # context dependence actually shows in pixels


def test_loader_determinism():
    ds = SyntheticSegmentation(16, (32, 32), num_classes=4)
    dl1 = DataLoader(ds, 4, shuffle=True, seed=7, num_workers=2)
    dl2 = DataLoader(ds, 4, shuffle=True, seed=7, num_workers=2)
    dl1.set_epoch(3)
    dl2.set_epoch(3)
    b1 = [b["label"] for b in dl1]
    b2 = [b["label"] for b in dl2]
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x, y)
    # different epoch -> different order
    dl2.set_epoch(4)
    b3 = [b["label"] for b in dl2]
    assert any(not np.array_equal(x, y) for x, y in zip(b1, b3))


def test_loader_propagates_worker_errors():
    """A dataset/transform exception must raise in the training loop,
    not hang the consumer forever (the producer always terminates the
    queue)."""
    import pytest

    class Broken:
        def __len__(self):
            return 8

        def __getitem__(self, idx):
            if idx >= 4:
                raise OSError("corrupt image")
            return {"image": np.zeros((4, 4, 3), np.float32),
                    "label": np.zeros((4, 4), np.int32)}

    dl = DataLoader(Broken(), 4, shuffle=False, num_workers=2)
    with pytest.raises(RuntimeError, match="worker failed"):
        for _ in dl:
            pass


def test_loader_abandoned_iterator_reaps_producer():
    """Breaking out mid-epoch (steps_per_epoch cap) must not leak the
    producer thread blocked on a full prefetch queue."""
    import threading

    ds = SyntheticSegmentation(64, (16, 16), num_classes=4)
    dl = DataLoader(ds, 4, shuffle=False, num_workers=2, prefetch=1)
    before = threading.active_count()
    for _ in range(3):  # three abandoned epochs
        it = iter(dl)
        next(it)
        it.close()  # what GC does to an abandoned generator
    assert threading.active_count() <= before + 1


def test_collate():
    out = collate(
        [{"a": np.zeros((2, 2)), "b": "x"}, {"a": np.ones((2, 2)), "b": "y"}]
    )
    assert out["a"].shape == (2, 2, 2)
    assert out["b"] == ["x", "y"]


def test_make_data_loader_voc(voc_tree):
    cfg = DataConfig(
        dataset="pascal", root=str(voc_tree), crop_size=33, base_size=33,
        batch_size=2, eval_batch_size=2, unseen_classes=(10,), num_workers=1,
    )
    train, val, n = make_data_loader(cfg)
    assert n == 21
    batch = next(iter(train))
    assert batch["image"].shape == (2, 33, 33, 3)
    assert batch["image"].dtype == np.float32
    assert batch["label"].dtype == np.int32


def test_embeddings_registry(tmp_path):
    emb = load_class_embeddings(VOC_CLASSES)
    assert emb.shape == (21, 300)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-5)
    # deterministic across calls
    np.testing.assert_array_equal(emb, load_class_embeddings(VOC_CLASSES))
    # file path loads and validates row count
    path = tmp_path / "emb.npy"
    np.save(path, np.ones((21, 300), np.float32))
    loaded = load_class_embeddings(VOC_CLASSES, str(path))
    assert loaded.shape == (21, 300)
    with pytest.raises(ValueError):
        load_class_embeddings(CONTEXT_CLASSES, str(path))


def test_seen_classes_helper():
    assert seen_classes(5, (1, 3)) == (0, 2, 4)


@pytest.fixture()
def context_tree(tmp_path):
    base = tmp_path / "VOC2010"
    (base / "JPEGImages").mkdir(parents=True)
    (base / "SegmentationClassContext").mkdir()
    (base / "ImageSets" / "SegmentationContext").mkdir(parents=True)
    rng = np.random.default_rng(2)
    names = [f"ctx{i:03d}" for i in range(3)]
    for i, name in enumerate(names):
        img = rng.integers(0, 255, (30, 30, 3), dtype=np.uint8)
        Image.fromarray(img).save(base / "JPEGImages" / f"{name}.jpg")
        lbl = np.zeros((30, 30), np.uint8)
        lbl[5:10, 5:10] = 19 if i == 0 else 3  # 19 = cow in CONTEXT_CLASSES
        Image.fromarray(lbl).save(base / "SegmentationClassContext" / f"{name}.png")
    with open(base / "ImageSets" / "SegmentationContext" / "train.txt", "w") as f:
        f.write("\n".join(names) + "\n")
    return tmp_path


def test_context_reader_and_filter(context_tree):
    from zs3_tpu.data.context import ContextSegmentation

    assert CONTEXT_CLASSES[19] == "cow"
    ds = ContextSegmentation(str(context_tree), "train", unseen_classes=(19,))
    assert len(ds) == 2  # ctx000 contains cow and is filtered
    unfiltered = ContextSegmentation(
        str(context_tree), "train", unseen_classes=(19,), filter_unseen=False
    )
    assert len(unfiltered) == 3
    assert unfiltered[0]["image"].shape == (30, 30, 3)


def test_embedding_pkl_and_concat(tmp_path):
    import pickle

    table = {n: np.full((10,), i, np.float32) for i, n in enumerate(VOC_CLASSES)}
    pkl = tmp_path / "w2v.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(table, f)
    emb = load_class_embeddings(VOC_CLASSES, str(pkl), normalize=False)
    assert emb.shape == (21, 10)
    np.testing.assert_allclose(emb[3], 3.0)
    # comma-separated paths concatenate feature-wise (fastnvec style)
    npy = tmp_path / "ft.npy"
    np.save(npy, np.ones((21, 5), np.float32))
    emb2 = load_class_embeddings(VOC_CLASSES, f"{pkl},{npy}", normalize=False)
    assert emb2.shape == (21, 15)
    # missing class raises
    del table["cow"]
    with open(pkl, "wb") as f:
        pickle.dump(table, f)
    with pytest.raises(ValueError):
        load_class_embeddings(VOC_CLASSES, str(pkl))
