"""ZS5Net self-training: pseudo-label unseen pixels, then retrain.

Functional parity target: the reference's ZS5 variant (SURVEY.md §3.4;
reference hooks: VOCSegmentation(weak_label=True,
unseen_classes_idx_weak=[...]) serving pseudo-labels instead of GT):

  trained ZS3Net -> inference over train images containing unseen
  classes -> pseudo-label the unseen pixels, with predictions restricted
  by the image-level tag set (the weak supervision ZS5 assumes) ->
  re-run GMMN + classifier training on the augmented label set.

Pipeline here:
  1. `generate_pseudo_labels` runs a single jit-compiled restricted
     argmax over each train image (fixed 513 resize -> one compile),
     writes PNG pseudo-labels at native resolution;
  2. `ZS5Trainer` re-runs GMMNTrainer with the dataset's weak-label path
     pointed at that directory (no unseen-image filtering).

Pixels whose GT is a *seen* class (or ignore) keep their GT; only
unseen-class pixels receive model predictions, restricted to the image's
unseen tags — matching the zero-shot protocol (unseen GT masks are never
used as targets, only their image-level presence).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from zs3_tpu.core.config import Config
from zs3_tpu.data.transforms import fixed_resize, normalize
from zs3_tpu.train.gmmn import GMMNTrainer, splice_classifier


def make_pseudo_label_step(model, num_classes: int):
    from zs3_tpu.ops.pallas_eval import predict_labels

    @jax.jit
    def step(variables, image, allowed_mask):
        """image (1,S,S,3) normalized; allowed_mask (C,) 1=class allowed.

        Returns restricted argmax (1,S,S).  Channel masking commutes with
        the (channelwise, convex) bilinear upsample, so the restriction
        applies at the feature grid and the fused upsample+argmax kernel
        handles the rest.
        """
        feats = model.apply(
            variables, image, train=False, method="forward_features"
        )
        logits = model.apply(variables, feats, method="classify").astype(
            jnp.float32
        )
        neg = jnp.finfo(jnp.float32).min
        restricted = jnp.where(allowed_mask[None, None, None, :] > 0, logits, neg)
        return predict_labels(restricted, image.shape[1:3])

    return step


def generate_pseudo_labels(
    model,
    variables,
    dataset,
    unseen_classes: Sequence[int],
    out_dir: str,
    size: int = 513,
    ignore_index: int = 255,
) -> int:
    """Write pseudo-label PNGs for every image in `dataset` that contains
    unseen classes; returns the number written.

    Image-level tags are derived from the GT's class-presence set — the
    weak supervision ZS5 assumes given (the per-pixel unseen GT itself is
    never copied into a target).
    """
    os.makedirs(out_dir, exist_ok=True)
    unseen = np.asarray(sorted(unseen_classes))
    num_classes = dataset.NUM_CLASSES
    step = make_pseudo_label_step(model, num_classes)
    # Pin the (large) variable tree on device once; otherwise every call
    # re-transfers ~160MB of params through the host.
    variables = jax.device_put(variables)
    written = 0
    for i in range(len(dataset)):
        sample = dataset[i]
        gt = np.asarray(sample["label"])
        present = np.unique(gt)
        unseen_here = np.intersect1d(present, unseen)
        if unseen_here.size == 0:
            continue
        # Model input: fixed resize (one jit compilation for all images).
        resized = fixed_resize(
            {"image": sample["image"], "label": gt}, size
        )
        norm = normalize(resized)
        # Allowed classes: only this image's unseen tags — seen/ignore
        # pixels keep GT below, so restriction is purely over unseen.
        allowed = np.zeros((num_classes,), np.float32)
        allowed[unseen_here] = 1.0
        pred = step(
            variables,
            jnp.asarray(norm["image"])[None],
            jnp.asarray(allowed),
        )
        pred_np = np.asarray(pred[0], dtype=np.uint8)
        # Back to native resolution (nearest).
        pred_img = Image.fromarray(pred_np, mode="L").resize(
            (gt.shape[1], gt.shape[0]), Image.NEAREST
        )
        pred_full = np.asarray(pred_img)
        is_unseen_px = np.isin(gt, unseen_here)
        pseudo = np.where(is_unseen_px, pred_full, gt).astype(np.uint8)
        Image.fromarray(pseudo, mode="L").save(
            os.path.join(out_dir, sample["name"] + ".png")
        )
        written += 1
    return written


class WeakLabelDataset:
    """Wrap any dataset, overriding labels from a pseudo-label directory.

    Used for datasets without a native weak_label_dir hook (synthetic);
    VOC/Context use their built-in weak-label path instead.
    """

    def __init__(self, dataset, weak_label_dir: str):
        self.dataset = dataset
        self.weak_label_dir = weak_label_dir
        self.NUM_CLASSES = dataset.NUM_CLASSES
        self.names = dataset.names

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx: int):
        sample = self.dataset[idx]
        path = os.path.join(self.weak_label_dir, sample["name"] + ".png")
        if os.path.exists(path):
            sample = {**sample, "label": np.asarray(Image.open(path))}
        return sample


class ZS5Trainer(GMMNTrainer):
    """Stage A: pseudo-label with the current ZS3Net; stage B: GMMN
    retraining over the augmented (weak) label set."""

    def __init__(
        self,
        cfg: Config,
        seg_variables=None,
        pseudo_label_dir: Optional[str] = None,
        mesh=None,
        saver=None,
    ):
        import dataclasses

        pseudo_dir = pseudo_label_dir or os.path.join(
            cfg.train.checkpoint_dir, "pseudo_labels"
        )
        cfg = cfg.replace(
            data=dataclasses.replace(cfg.data, weak_label_dir=pseudo_dir)
        )
        super().__init__(cfg, seg_variables=seg_variables, mesh=mesh, saver=saver)
        self.pseudo_dir = pseudo_dir
        # Synthetic has no native weak-label hook: wrap its train set.
        if cfg.data.dataset == "synthetic":
            self.train_loader.dataset = WeakLabelDataset(
                self.train_loader.dataset, pseudo_dir
            )

    def pseudo_label(self) -> int:
        """Run stage A with the current (trunk + retrained-classifier)
        network over the train set."""
        variables = splice_classifier(self.trunk_variables, self.cls_state.params)
        base = self.train_loader.dataset
        if isinstance(base, WeakLabelDataset):
            base = base.dataset
        return generate_pseudo_labels(
            self.model,
            variables,
            base,
            self.unseen,
            self.pseudo_dir,
            size=self.cfg.data.crop_size,
            ignore_index=self.cfg.data.ignore_index,
        )
