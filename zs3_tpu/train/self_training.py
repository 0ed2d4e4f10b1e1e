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
     pointed at that directory (no unseen-image filtering) and
     gmmn.self_training=True, so real features at pseudo-labeled pixels
     flow into the classifier CE and the MMD targets.

Weak-supervision contract (what stage 1 is allowed to consume):
  * the image;
  * the seen-GT view: per-pixel GT where its value is a seen class or
    ignore — pixels annotated with an unseen class appear UNLABELED
    (this labeled/unlabeled partition is exactly what a ZS5 annotator
    provides, so reading it is not a leak);
  * the image-level unseen tag set.
Unlabeled pixels receive the model's own argmax restricted to
(seen classes ∪ the image's unseen tags), optionally confidence-
thresholded to ignore.  Per-pixel unseen GT *values* are never read —
swapping unseen class ids inside a region changes nothing (tested) —
so the model, not the annotation, localizes each unseen class.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from zs3_tpu.core.config import Config
from zs3_tpu.data.transforms import letterbox_image, normalize, unletterbox_pred
from zs3_tpu.train.gmmn import GMMNTrainer, splice_classifier


def make_pseudo_label_step(model, num_classes: int, confidence: float = 0.0):
    from zs3_tpu.ops.pallas_eval import predict_labels

    def restricted_logits(variables, image, allowed_mask):
        """(1,S,S,C) logits with disallowed classes at -inf.

        Channel masking commutes with the (channelwise, convex) bilinear
        upsample, so the restriction applies at the feature grid and the
        fused upsample+argmax kernel handles the rest."""
        feats = model.apply(
            variables, image, train=False, method="forward_features"
        )
        logits = model.apply(variables, feats, method="classify").astype(
            jnp.float32
        )
        neg = jnp.finfo(jnp.float32).min
        return jnp.where(allowed_mask[None, None, None, :] > 0, logits, neg)

    if confidence <= 0.0:

        @jax.jit
        def step(variables, image, allowed_mask):
            """-> ((1,S,S) restricted argmax, None)."""
            restricted = restricted_logits(variables, image, allowed_mask)
            return predict_labels(restricted, image.shape[1:3]), None

    else:
        from zs3_tpu.ops.resize import resize_bilinear

        @jax.jit
        def step(variables, image, allowed_mask):
            """-> ((1,S,S) argmax, (1,S,S) max softmax prob).

            The confidence path materializes full-res logits (softmax
            needs all channels), so it skips the fused kernel — fine for
            the offline pseudo-labeling stage."""
            restricted = restricted_logits(variables, image, allowed_mask)
            up = resize_bilinear(restricted, image.shape[1:3], True)
            pred = jnp.argmax(up, axis=-1).astype(jnp.int32)
            conf = jnp.max(jax.nn.softmax(up, axis=-1), axis=-1)
            return pred, conf

    return step


def generate_pseudo_labels(
    model,
    variables,
    dataset,
    unseen_classes: Sequence[int],
    out_dir: str,
    size: int = 513,
    ignore_index: int = 255,
    confidence: float = 0.0,
) -> int:
    """Write pseudo-label PNGs for every image in `dataset` whose tag set
    contains unseen classes; returns the number written.

    Consumes ONLY the weak annotation (module docstring): the image, the
    seen-GT view (GT where it is a seen class or ignore; unseen-valued
    pixels are just "unlabeled" — their class ids are never read), and
    the image-level tag set.  Unlabeled pixels get the model's argmax
    restricted to (seen ∪ tags); predictions below `confidence` (max
    softmax prob) are written as `ignore_index` instead.
    """
    os.makedirs(out_dir, exist_ok=True)
    unseen = np.asarray(sorted(unseen_classes))
    num_classes = dataset.NUM_CLASSES
    step = make_pseudo_label_step(model, num_classes, confidence)
    # Pin the (large) variable tree on device once; otherwise every call
    # re-transfers ~160MB of params through the host.
    variables = jax.device_put(variables)
    written = 0
    for i in range(len(dataset)):
        sample = dataset[i]
        gt = np.asarray(sample["label"])
        # Image-level tags: which unseen classes the annotator flagged.
        tags = np.intersect1d(np.unique(gt), unseen)
        if tags.size == 0:
            continue
        # Seen-GT view: True where the weak annotation labels the pixel
        # (a seen class or ignore).  The unlabeled complement is part of
        # the annotation itself; the unseen values under it are not.
        labeled = ~np.isin(gt, unseen)
        # Model input: aspect-preserving letterbox onto the fixed square
        # (one jit compilation for all images; padding normalizes to 0).
        canvas, content = letterbox_image(sample["image"], size)
        norm = normalize(
            {"image": canvas, "label": np.zeros((size, size), np.uint8)}
        )
        # Restrict the prediction to seen classes + this image's tags.
        allowed = np.ones((num_classes,), np.float32)
        allowed[unseen] = 0.0
        allowed[tags] = 1.0
        pred, conf = step(
            variables,
            jnp.asarray(norm["image"])[None],
            jnp.asarray(allowed),
        )
        ch, cw = content
        # Back to native resolution (crop content region, nearest).
        pred_full = unletterbox_pred(
            np.asarray(pred[0]), content, gt.shape[:2]
        ).astype(np.int64)
        if conf is not None:
            conf_img = Image.fromarray(
                np.asarray(conf[0], dtype=np.float32)[:ch, :cw], mode="F"
            ).resize((gt.shape[1], gt.shape[0]), Image.NEAREST)
            low = np.asarray(conf_img) < confidence
            pred_full = np.where(low, ignore_index, pred_full)
        pseudo = np.where(labeled, gt, pred_full).astype(np.uint8)
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


def _gt_view(dataset):
    """A view of `dataset` serving the REAL (weak) annotation.

    Stage A (pseudo-labeling) must never read pseudo PNGs from a
    previous run as if they were ground truth — rerunning train-zs5
    with an existing pseudo_labels dir would otherwise freeze the last
    model's outputs into the annotation and drift.  Undoes any
    weak_label_dir override, recursively through wrappers/unions.
    """
    import copy

    if isinstance(dataset, WeakLabelDataset):
        return _gt_view(dataset.dataset)
    if getattr(dataset, "weak_label_dir", None):
        ds = copy.copy(dataset)
        ds.weak_label_dir = None
        return ds
    if hasattr(dataset, "_items"):  # CombineDBs: clean each sub-dataset
        ds = copy.copy(dataset)
        cleaned: dict = {}
        ds._items = [
            (cleaned.setdefault(id(sub), _gt_view(sub)), i)
            for sub, i in dataset._items
        ]
        return ds
    return dataset


class ZS5Trainer(GMMNTrainer):
    """Stage A: pseudo-label with the current ZS3Net; stage B: GMMN
    retraining over the augmented (weak) label set."""

    # Distinct from GMMNTrainer's "-gmmn" so a ZS5 run never shadows a
    # ZS3 run under --auto-resume (they share the gen/cls state shapes,
    # so a cross-stage restore would succeed silently).
    checkpoint_suffix = "-zs5"

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
            data=dataclasses.replace(cfg.data, weak_label_dir=pseudo_dir),
            # Real features at pseudo-labeled unseen pixels must reach
            # the classifier CE and the MMD targets (reference ZS5
            # retrains on the augmented label set, not on generated
            # stand-ins) — see classifier_training_set/mmd_training_masks.
            gmmn=dataclasses.replace(cfg.gmmn, self_training=True),
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
        network over the train set.

        Under --int8-features the labeling forward runs s8 x s8 too
        (pure inference; the retrained classifier stays float by the
        exclusion rule) — the context wraps the whole pass, so the
        step's first-call trace lands inside it."""
        import contextlib

        from zs3_tpu import quant

        variables = splice_classifier(self.trunk_variables, self.cls_state.params)
        base = _gt_view(self.train_loader.dataset)
        int8_ctx = (
            quant.quantized(self._trunk_int8_scales())
            if self.cfg.train.int8_features
            else contextlib.nullcontext()
        )
        with int8_ctx:
            return generate_pseudo_labels(
                self.model,
                variables,
                base,
                self.unseen,
                self.pseudo_dir,
                size=self.cfg.data.crop_size,
                ignore_index=self.cfg.data.ignore_index,
                confidence=self.cfg.gmmn.pseudo_confidence,
            )
