"""Test-time augmentation evaluation: multi-scale + horizontal flip.

The reference validates single-scale only (SURVEY.md §3.5) — matching
the ZS3 paper's protocol — but the DeepLab lineage's standard reporting
mode averages softmax probabilities over scaled and mirrored inputs
(arXiv:1802.02611 §4 "ms+flip").  This module adds that as an opt-in
(`TrainConfig.eval_scales` / `eval_flip`), defaulting to the
reference's single-scale behavior.

TPU shape: the whole TTA ensemble is ONE jit program — scales are
static, so each scaled forward compiles once; probability accumulation
and the final argmax+confusion stay on device (no host round trip per
augmentation).
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

from zs3_tpu.ops.confusion import confusion_matrix
from zs3_tpu.ops.resize import resize_bilinear


def tta_probs(
    forward_fn: Callable[[dict, jax.Array], jax.Array],
    variables,
    images: jax.Array,
    scales: Sequence[float] = (1.0,),
    flip: bool = False,
) -> jax.Array:
    """(B, H, W, C) mean softmax probabilities over the TTA ensemble.

    forward_fn(variables, images) must return logits at the INPUT
    resolution of `images` (the DeepLab forward upsamples internally).
    """
    h, w = images.shape[1:3]
    probs = None
    for scale in scales:
        if scale == 1.0:
            xs = images
        else:
            hs = max(int(round(h * scale)), 1)
            ws = max(int(round(w * scale)), 1)
            xs = resize_bilinear(images, (hs, ws))
        views = [xs]
        if flip:
            views.append(xs[:, :, ::-1, :])
        for i, view in enumerate(views):
            logits = forward_fn(variables, view).astype(jnp.float32)
            if i == 1:
                logits = logits[:, :, ::-1, :]
            if logits.shape[1:3] != (h, w):
                logits = resize_bilinear(logits, (h, w))
            p = jax.nn.softmax(logits, axis=-1)
            probs = p if probs is None else probs + p
    n_views = len(scales) * (2 if flip else 1)
    return probs / n_views


def make_tta_eval_step(
    forward_fn: Callable[[dict, jax.Array], jax.Array],
    num_classes: int,
    ignore_index: int,
    scales: Sequence[float] = (1.0,),
    flip: bool = False,
):
    """jit step: (variables, batch) -> (C, C) confusion matrix under TTA."""
    scales = tuple(scales)

    @jax.jit
    def step(variables, batch):
        probs = tta_probs(forward_fn, variables, batch["image"], scales, flip)
        pred = jnp.argmax(probs, axis=-1).astype(jnp.int32)
        return confusion_matrix(batch["label"], pred, num_classes, ignore_index)

    return step
