"""Synthetic segmentation dataset for tests, smoke runs, and benches.

No dataset ships with this image (no network), so every pipeline must be
exercisable without VOC on disk.  This generates deterministic
random-blob scenes: each image contains a background plus a few
axis-aligned class rectangles; labels match exactly.  The generator is
seeded per index, so dataset[i] is stable across processes.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


class SyntheticSegmentation:
    def __init__(
        self,
        num_items: int = 64,
        image_size: Tuple[int, int] = (128, 128),
        num_classes: int = 21,
        max_objects: int = 4,
        seed: int = 0,
        classes: Sequence[int] | None = None,
    ):
        self.NUM_CLASSES = num_classes
        self.num_items = num_items
        self.image_size = image_size
        self.max_objects = max_objects
        self.seed = seed
        self.classes = tuple(classes) if classes is not None else tuple(
            range(1, num_classes)
        )
        self.names = [f"synthetic_{i:05d}" for i in range(num_items)]

    def __len__(self) -> int:
        return self.num_items

    def __getitem__(self, idx: int):
        rng = np.random.default_rng(self.seed * 100003 + idx)
        h, w = self.image_size
        image = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        label = np.zeros((h, w), dtype=np.uint8)
        n_obj = int(rng.integers(1, self.max_objects + 1))
        for _ in range(n_obj):
            cls = int(rng.choice(self.classes))
            bh = int(rng.integers(h // 8, h // 2))
            bw = int(rng.integers(w // 8, w // 2))
            y0 = int(rng.integers(0, h - bh))
            x0 = int(rng.integers(0, w - bw))
            label[y0 : y0 + bh, x0 : x0 + bw] = cls
            # tint the image region so the class is learnable
            tint = np.array(
                [37 * cls % 256, 83 * cls % 256, 151 * cls % 256], np.uint8
            )
            image[y0 : y0 + bh, x0 : x0 + bw] = (
                image[y0 : y0 + bh, x0 : x0 + bw] // 4 + 3 * tint[None, None] // 4
            )
        return {"image": image, "label": label, "name": self.names[idx]}
