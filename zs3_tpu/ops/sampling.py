"""Jit-safe per-class pixel sampling.

The reference loops over classes present in a batch and indexes feature
tensors with boolean masks of varying size (reference:
train_pascal_GMMN.py generator step) — dynamic shapes that cannot exist
under jit.  The TPU-native scheme: every class gets a fixed pixel
*budget*; selection is a random top-k over masked uniform scores, and a
validity mask records how many real pixels each class actually had.
Downstream ops (MMD, classifier CE) consume the masks, so classes with
fewer pixels than budget (or zero) degrade gracefully with no recompile.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def sample_class_pixels(
    feats: jax.Array,
    labels: jax.Array,
    num_classes: int,
    budget: int,
    rng: jax.Array,
    return_indices: bool = False,
):
    """Sample up to `budget` random pixels of every class.

    feats: (N, D) flat pixel features; labels: (N,) int class ids (255 or
    out-of-range = ignore).  Returns (gathered (C, budget, D),
    mask (C, budget)) where mask[c, j] = 1 iff slot j holds a real pixel
    of class c; with return_indices also the flat indices (C, budget)
    (e.g. to recover which image each pixel came from).  Random *without
    replacement* within each class.
    """
    if feats.ndim != 2 or labels.ndim != 1 or feats.shape[0] != labels.shape[0]:
        raise ValueError(
            f"sample_class_pixels expects feats (N, D) and labels (N,); "
            f"got {feats.shape} and {labels.shape}"
        )
    n = labels.shape[0]
    u = jax.random.uniform(
        rng, (num_classes, n), minval=1e-6, maxval=1.0
    )  # strictly positive scores
    classes = jnp.arange(num_classes, dtype=labels.dtype)
    member = labels[None, :] == classes[:, None]  # (C, N)
    scores = jnp.where(member, u, -1.0)
    vals, idx = jax.lax.top_k(scores, budget)  # (C, budget)
    mask = (vals > 0.0).astype(jnp.float32)
    gathered = feats[idx]  # (C, budget, D)
    gathered = gathered * mask[..., None]
    if return_indices:
        return gathered, mask, idx
    return gathered, mask


def downsample_labels(labels: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Nearest-neighbor downsample of (B, H, W) int labels to the feature
    grid (the reference downsamples GT to the os4 grid for GMMN)."""
    from zs3_tpu.ops.resize import resize_nearest

    return resize_nearest(labels, size)


def per_image_adjacency(labels: jax.Array, num_classes: int) -> jax.Array:
    """(B, C, C) adjacency counts, one graph per image (the paper's
    spatial-context priors are per scene, not per batch)."""
    return jax.vmap(lambda l: class_adjacency(l[None], num_classes))(labels)


def class_adjacency(labels: jax.Array, num_classes: int) -> jax.Array:
    """(C, C) float adjacency counts from a batch of label maps.

    adj[a, b] = number of 4-neighbor pixel pairs where class a touches
    class b (symmetric, zero diagonal).  Built from one-hot shifts as
    MXU contractions; feeds the graph-context GMMN conditioning
    (paper arXiv:1906.00817 spatial-context priors).
    """
    oh = jax.nn.one_hot(
        jnp.clip(labels, 0, num_classes - 1), num_classes, dtype=jnp.float32
    )
    valid = ((labels >= 0) & (labels < num_classes)).astype(jnp.float32)[..., None]
    oh = oh * valid  # ignore pixels contribute nothing
    adj = jnp.zeros((num_classes, num_classes), jnp.float32)
    # vertical and horizontal neighbor contractions
    adj += jnp.einsum("bhwc,bhwd->cd", oh[:, :-1], oh[:, 1:])
    adj += jnp.einsum("bhwc,bhwd->cd", oh[:, :, :-1], oh[:, :, 1:])
    adj = adj + adj.T
    return adj * (1.0 - jnp.eye(num_classes))


def neighbor_lists_from_adjacency(
    adj: jax.Array, max_neighbors: int
) -> Tuple[jax.Array, jax.Array]:
    """Top-k neighbor class ids per class + validity mask.

    Returns (neighbors (C, K) int32, mask (C, K) float32)."""
    vals, idx = jax.lax.top_k(adj, max_neighbors)
    return idx.astype(jnp.int32), (vals > 0).astype(jnp.float32)
