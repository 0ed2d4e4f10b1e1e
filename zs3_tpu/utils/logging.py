"""Metric logging: JSONL stream + optional TensorBoard.

Functional parity target: reference zs3/utils/summaries.py
(TensorboardSummary: SummaryWriter scalars + visualize_image panels).
The primary sink here is an append-only metrics.jsonl per experiment
(machine-readable, survives without TF); TensorBoard is optional and
lazily imported so the core path has no TF dependency.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict

import numpy as np


class MetricLogger:
    def __init__(self, directory: str, tensorboard: bool = False):
        os.makedirs(directory, exist_ok=True)
        self.path = os.path.join(directory, "metrics.jsonl")
        self._tb = None
        if tensorboard:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(
                    os.path.join(directory, "tb")
                )
            except Exception:
                self._tb = None

    def log(self, step: int, scalars: Dict[str, float], prefix: str = ""):
        record = {
            "step": int(step),
            "time": time.time(),
            **{
                (f"{prefix}/{k}" if prefix else k): float(v)
                for k, v in scalars.items()
                if np.isscalar(v) or isinstance(v, (int, float, np.floating))
            },
        }
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in scalars.items():
                    name = f"{prefix}/{k}" if prefix else k
                    tf.summary.scalar(name, float(v), step=step)

    def log_images(self, step: int, images: Dict[str, np.ndarray]):
        """images: name -> (H, W, 3) uint8.  TB-only; JSONL records names."""
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for name, img in images.items():
                    tf.summary.image(name, img[None], step=step)
