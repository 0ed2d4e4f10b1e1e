"""Offline inference: image files -> segmentation PNGs.

The reference has no standalone inference script (predictions only ever
materialize inside validation loops); this fills that gap for framework
users: load a checkpoint, run each image through the fixed-size jit
forward (single compilation), resize predictions back to native
resolution, write raw label PNGs + colorized panels.
"""

from __future__ import annotations

import os
from typing import Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from zs3_tpu.core.config import Config
from zs3_tpu.data.transforms import fixed_resize, normalize
from zs3_tpu.models.deeplab import build_deeplab
from zs3_tpu.train.state import create_seg_state
from zs3_tpu.utils.saver import Saver
from zs3_tpu.utils.viz import decode_segmap


class Predictor:
    def __init__(self, cfg: Config, checkpoint: Optional[str] = None):
        self.cfg = cfg
        self.model = build_deeplab(cfg.model)
        rng = jax.random.key(cfg.train.seed)
        state = create_seg_state(
            self.model,
            cfg,
            rng,
            (1, cfg.data.crop_size, cfg.data.crop_size, 3),
            total_steps=1,
        )
        ckpt = checkpoint or cfg.train.resume
        if ckpt:
            state = Saver.restore(ckpt, state)
        self.variables = jax.device_put(
            {"params": state.params, "batch_stats": state.batch_stats}
        )
        self._predict = jax.jit(
            lambda v, x: jnp.argmax(
                self.model.apply(v, x, train=False), axis=-1
            ).astype(jnp.int32)
        )

    def predict_array(self, image: np.ndarray) -> np.ndarray:
        """HWC uint8 image -> HW int32 label map at native resolution."""
        h, w = image.shape[:2]
        size = self.cfg.data.crop_size
        resized = fixed_resize(
            {"image": image, "label": np.zeros(image.shape[:2], np.uint8)}, size
        )
        norm = normalize(resized)
        pred = np.asarray(
            self._predict(self.variables, jnp.asarray(norm["image"])[None])
        )[0].astype(np.uint8)
        return np.asarray(
            Image.fromarray(pred, mode="L").resize((w, h), Image.NEAREST)
        ).astype(np.int32)

    def predict_batch(self, images: "list[np.ndarray]") -> "list[np.ndarray]":
        """Batched inference: one device round trip for many images.

        Images resize to the model's fixed input; predictions return at
        each image's native resolution.
        """
        size = self.cfg.data.crop_size
        stacked = []
        for image in images:
            resized = fixed_resize(
                {"image": image, "label": np.zeros(image.shape[:2], np.uint8)},
                size,
            )
            stacked.append(normalize(resized)["image"])
        preds = np.asarray(
            self._predict(self.variables, jnp.asarray(np.stack(stacked)))
        ).astype(np.uint8)
        out = []
        for image, pred in zip(images, preds):
            h, w = image.shape[:2]
            out.append(
                np.asarray(
                    Image.fromarray(pred, mode="L").resize((w, h), Image.NEAREST)
                ).astype(np.int32)
            )
        return out

    def predict_files(
        self,
        paths: Iterable[str],
        out_dir: str,
        colorize: bool = True,
        batch_size: int = 8,
    ) -> List[str]:
        os.makedirs(out_dir, exist_ok=True)
        paths = list(paths)
        written = []
        for start in range(0, len(paths), batch_size):
            chunk = paths[start : start + batch_size]
            images = [np.asarray(Image.open(p).convert("RGB")) for p in chunk]
            # pad the final chunk so the jit predict sees one batch shape
            n_real = len(images)
            while len(images) < batch_size:
                images.append(images[0])
            preds = self.predict_batch(images)[:n_real]
            for path, pred in zip(chunk, preds):
                stem = os.path.splitext(os.path.basename(path))[0]
                raw = os.path.join(out_dir, stem + ".png")
                Image.fromarray(pred.astype(np.uint8), mode="L").save(raw)
                written.append(raw)
                if colorize:
                    color = decode_segmap(pred, self.cfg.model.num_classes)
                    color_path = os.path.join(out_dir, stem + "_color.png")
                    Image.fromarray(color).save(color_path)
                    written.append(color_path)
        return written
