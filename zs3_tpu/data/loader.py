"""Batch loading: dataset -> transformed, collated numpy batches.

Functional parity target: reference zs3/dataloaders/__init__.py
(make_data_loader(args) -> (train, val, test, num_classes)) on top of
torch DataLoader.  Rebuilt without torch: a thread-pool maps the host
transforms over shuffled indices, batches are collated into pinned
numpy arrays, and a small prefetch queue overlaps host decode with
device compute.  Epoch order is a pure function of (seed, epoch), so
resume reproduces the exact stream.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, Optional, Sequence

import numpy as np

from zs3_tpu.core.config import DataConfig
from zs3_tpu.data import transforms as T


def collate(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    out: Dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        else:
            out[key] = vals
    return out


class DataLoader:
    """Deterministic shuffling, threaded transform, prefetching iterator."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        transform: Optional[Callable] = None,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        num_workers: int = 4,
        prefetch: int = 2,
        transform_needs_rng: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.transform = transform
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.transform_needs_rng = transform_needs_rng
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            rng.shuffle(idx)
        return idx

    def _load_one(self, idx: int) -> Dict[str, np.ndarray]:
        sample = self.dataset[int(idx)]
        sample = {k: v for k, v in sample.items() if k != "name"}
        if self.transform is not None:
            if self.transform_needs_rng:
                rng = np.random.default_rng((self.seed, self.epoch, int(idx)))
                sample = self.transform(sample, rng)
            else:
                sample = self.transform(sample)
        return sample

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._order()
        n_batches = len(self)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()

        class _ProducerError:
            def __init__(self, exc):
                self.exc = exc

        def producer():
            # Contract: ALWAYS terminate with sentinel (or _ProducerError)
            # and never block forever on a consumer that went away — a
            # dataset/transform exception must surface in the training
            # loop, not hang it, and an abandoned iterator (e.g.
            # steps_per_epoch cap) must not leak this thread + pool.
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in range(n_batches):
                        if stop.is_set():
                            return
                        chunk = order[
                            b * self.batch_size : (b + 1) * self.batch_size
                        ]
                        batch = collate(list(pool.map(self._load_one, chunk)))
                        while not stop.is_set():
                            try:
                                q.put(batch, timeout=0.1)
                                break
                            except queue.Full:
                                continue
            except BaseException as e:  # propagate to the consumer
                while not stop.is_set():
                    try:
                        q.put(_ProducerError(e), timeout=0.1)
                        return
                    except queue.Full:
                        continue
            else:
                while not stop.is_set():
                    try:
                        q.put(sentinel, timeout=0.1)
                        return
                    except queue.Full:
                        continue

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                if isinstance(item, _ProducerError):
                    raise RuntimeError(
                        "DataLoader worker failed while loading a batch"
                    ) from item.exc
                yield item
        finally:
            # Runs on normal exhaustion AND on generator close/GC:
            # unblock any pending put, then reap the thread.
            stop.set()
            while thread.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    pass
                thread.join(timeout=0.05)


def make_data_loader(cfg: DataConfig, split_registry: Optional[Dict] = None):
    """(train_loader, val_loader, num_classes) for cfg.dataset.

    Mirrors the reference factory contract.  'synthetic' serves tests and
    dataset-free smoke runs.
    """
    unseen = cfg.unseen_classes

    if cfg.dataset == "pascal":
        from zs3_tpu.data.voc import VOCSegmentation

        # ZS5 weak-label mode keeps unseen-containing images in the train
        # set (that is the point of self-training) — no filtering then.
        train_ds: Any = VOCSegmentation(
            cfg.root,
            "train",
            unseen,
            filter_unseen=cfg.weak_label_dir is None,
            weak_label_dir=cfg.weak_label_dir,
        )
        val_ds: Any = VOCSegmentation(cfg.root, "val", unseen, filter_unseen=False)
        if cfg.use_sbd:
            from zs3_tpu.data.sbd import CombineDBs, SBDSegmentation

            sbd = SBDSegmentation(cfg.root, "train", unseen)
            train_ds = CombineDBs([train_ds, sbd], exclude_names=val_ds.names)
        num_classes = VOCSegmentation.NUM_CLASSES
    elif cfg.dataset == "context":
        from zs3_tpu.data.context import ContextSegmentation

        train_ds = ContextSegmentation(
            cfg.root,
            "train",
            unseen,
            filter_unseen=cfg.weak_label_dir is None,
            weak_label_dir=cfg.weak_label_dir,
        )
        val_ds = ContextSegmentation(cfg.root, "val", unseen, filter_unseen=False)
        num_classes = ContextSegmentation.NUM_CLASSES
    elif cfg.dataset == "synthetic":
        from zs3_tpu.data.synthetic import SyntheticSegmentation

        size = (cfg.crop_size, cfg.crop_size)
        n_cls = cfg.synthetic_classes
        # Mirror the VOC zero-shot protocol: the seen-training pool never
        # shows unseen classes (reference filter lbl_contains_unseen);
        # ZS5 weak-label mode keeps them (pseudo-labels replace GT).
        if unseen and cfg.weak_label_dir is None:
            train_classes: Any = tuple(
                c for c in range(1, n_cls) if c not in unseen
            )
        else:
            train_classes = None
        train_ds = SyntheticSegmentation(
            cfg.synthetic_items, size, num_classes=n_cls, seed=1,
            classes=train_classes, embedding_dim=cfg.synthetic_embed_dim,
            tint_weight=cfg.synthetic_tint_weight,
            context_tint=cfg.synthetic_context_tint,
        )
        val_ds = SyntheticSegmentation(
            max(16, cfg.synthetic_items // 4), size, num_classes=n_cls,
            seed=2, embedding_dim=cfg.synthetic_embed_dim,
            tint_weight=cfg.synthetic_tint_weight,
            context_tint=cfg.synthetic_context_tint,
        )
        num_classes = train_ds.NUM_CLASSES
    else:
        raise ValueError(f"unknown dataset {cfg.dataset!r}")

    host_tf = (
        T.train_transform_spatial if cfg.device_preprocess else T.train_transform
    )
    train_tf = lambda s, rng: host_tf(
        s, rng, cfg.base_size, cfg.crop_size, cfg.ignore_index
    )

    if cfg.input_pipeline == "tfdata" and cfg.dataset in ("pascal", "context"):
        if cfg.device_preprocess:
            # tfdata normalizes on the host; the device_preprocess train
            # step would normalize AGAIN on device — silently garbage
            # inputs.  Refuse the combination.
            raise ValueError(
                "input_pipeline='tfdata' already normalizes on the host; "
                "it cannot be combined with device_preprocess=True"
            )
        from zs3_tpu.data.tfdata import TFDataLoader

        train_loader = TFDataLoader(train_ds, cfg, seed=cfg.shuffle_seed)
        val_loader = DataLoader(
            val_ds,
            cfg.eval_batch_size,
            transform=lambda s: T.eval_transform(s, cfg.crop_size),
            shuffle=False,
            drop_last=False,
            seed=cfg.shuffle_seed,
            num_workers=cfg.num_workers,
            transform_needs_rng=False,
        )
        return train_loader, val_loader, num_classes
    val_tf = lambda s: T.eval_transform(s, cfg.crop_size)

    train_loader = DataLoader(
        train_ds,
        cfg.batch_size,
        transform=train_tf,
        shuffle=True,
        drop_last=True,
        seed=cfg.shuffle_seed,
        num_workers=cfg.num_workers,
    )
    val_loader = DataLoader(
        val_ds,
        cfg.eval_batch_size,
        transform=val_tf,
        shuffle=False,
        drop_last=False,
        seed=cfg.shuffle_seed,
        num_workers=cfg.num_workers,
        transform_needs_rng=False,
    )
    return train_loader, val_loader, num_classes
