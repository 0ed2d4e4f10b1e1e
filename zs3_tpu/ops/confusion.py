"""On-device confusion matrix.

The reference pulls every val batch to host and runs a numpy bincount
(reference: zs3/utils/metrics.py Evaluator.add_batch).  Here the matrix is
accumulated on-device as a one-hot matmul — an (C, N) @ (N, C) contraction
the MXU eats for free — and only the final (C, C) f32 matrix crosses to
host once per evaluation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def confusion_matrix(
    gt: jax.Array,
    pred: jax.Array,
    num_classes: int,
    ignore_index: int = 255,
) -> jax.Array:
    """Accumulate a (num_classes, num_classes) confusion matrix.

    Rows = ground truth, cols = prediction; pixels whose gt equals
    ignore_index (or falls outside [0, num_classes)) are dropped.
    Accepts any integer-shaped gt/pred of identical shape.
    """
    if gt.shape != pred.shape:
        raise ValueError(
            f"confusion_matrix: gt {gt.shape} and pred {pred.shape} differ"
        )
    gt = gt.reshape(-1).astype(jnp.int32)
    pred = pred.reshape(-1).astype(jnp.int32)
    valid = (gt != ignore_index) & (gt >= 0) & (gt < num_classes)
    gt = jnp.where(valid, gt, 0)
    pred = jnp.clip(pred, 0, num_classes - 1)
    onehot_gt = jax.nn.one_hot(gt, num_classes, dtype=jnp.float32)
    onehot_gt = onehot_gt * valid[:, None].astype(jnp.float32)
    onehot_pred = jax.nn.one_hot(pred, num_classes, dtype=jnp.float32)
    return jnp.einsum(
        "ng,np->gp", onehot_gt, onehot_pred, preferred_element_type=jnp.float32
    )
