"""ZS3Net zero-shot training: GMMN generator + classifier retraining.

Functional parity target: reference train_pascal_GMMN.py /
train_context_GMMN.py (class Trainer) — load a seen-classes DeepLab
checkpoint, freeze the trunk, then per batch (SURVEY.md §3.3):

  1. extract real 256-d pixel features on the os4 grid, labels
     downsampled to the feature grid;
  2. generator step: per seen class present in the batch, MMD between
     generated features (class embedding + noise) and that class's real
     pixel features; backprop the generator only;
  3. classifier step: synthesize unseen-class features from their
     embeddings, mix with real seen features, retrain the split 1x1
     classifier with CE.

TPU-native shape: steps 1-3 fuse into ONE jit program per batch.  The
ragged "pixels of class c in this batch" sets become fixed budgets +
masks (zs3_tpu.ops.sampling), so there is exactly one compilation.  The
classifier-retrain substep touches only (C, budget, 256) feature tensors
that never leave HBM (BASELINE.json: "retrains ... entirely in HBM").
Validation rebuilds the full network variables with the retrained
classifier kernel spliced in and reports seen/unseen/harmonic mIoU.
"""

from __future__ import annotations

import functools
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from zs3_tpu.core.config import Config
from zs3_tpu.core.mesh import make_mesh, replicate
from zs3_tpu.data.classes import CONTEXT_CLASSES, VOC_CLASSES
from zs3_tpu.data.embeddings import load_class_embeddings
from zs3_tpu.data.loader import make_data_loader
from zs3_tpu.metrics.evaluator import Evaluator
from zs3_tpu.models.deeplab import build_deeplab
from zs3_tpu.models.gmmn import build_gmmn
from zs3_tpu.ops.confusion import confusion_matrix
from zs3_tpu.ops.mmd import batched_mmd_loss
from zs3_tpu.ops.pallas_mmd import batched_pallas_mmd_loss
from zs3_tpu.ops.sampling import (
    class_adjacency,
    downsample_labels,
    neighbor_lists_from_adjacency,
    sample_class_pixels,
)
from zs3_tpu.train.state import create_seg_state
from zs3_tpu.utils.saver import Saver


class GenState(train_state.TrainState):
    pass


class ClsState(train_state.TrainState):
    pass


def splice_classifier(trunk_variables, cls_params):
    """Insert retrained (D, C) classifier weights back into the DeepLab
    variable tree (as the 1x1 conv the decoder holds)."""
    params = dict(trunk_variables["params"])
    decoder = dict(params["decoder"])
    classifier = {
        "conv": {
            "kernel": cls_params["kernel"][None, None],
            "bias": cls_params["bias"],
        }
    }
    decoder["classifier"] = classifier
    params["decoder"] = decoder
    return {**trunk_variables, "params": params}


def extract_classifier(variables) -> Dict[str, jax.Array]:
    conv = variables["params"]["decoder"]["classifier"]["conv"]
    return {"kernel": conv["kernel"][0, 0], "bias": conv["bias"]}


def mmd_training_masks(real_mask, seen_mask_f, self_training: bool):
    """(fake_mask, real_mask) the generator's MMD trains against.

    ZS3: only seen classes have trustworthy real features (unseen images
    were filtered from the train set), so both sides are seen-restricted.
    ZS5 (self_training): pseudo-labeled unseen pixels ARE the training
    signal — the reference retrain fits the generator against the
    augmented label set — so every class with real pixels is a target
    and the generator trains on all classes (empty rows are zero-mass
    no-ops inside the masked MMD)."""
    if self_training:
        return jnp.ones_like(real_mask), real_mask
    num_classes, budget = real_mask.shape
    fake_mask = jnp.broadcast_to(seen_mask_f[:, None], (num_classes, budget))
    return fake_mask, real_mask * seen_mask_f[:, None]


def classifier_training_set(real, real_mask, fake, unseen_mask, self_training: bool):
    """(features, mask) the classifier CE retrains on, both (C, P[, D]).

    ZS3: unseen rows are fully generated (no real unseen pixels exist in
    the filtered train set); seen rows are real under their sample mask.
    ZS5 (self_training): real features at pseudo-labeled unseen pixels
    take precedence — generated features only fill EMPTY unseen slots —
    so the classifier consumes real features under pseudo labels like
    the reference's self-training retrain (SURVEY.md §3.4)."""
    unseen_row = unseen_mask[:, None] > 0  # (C, 1)
    if self_training:
        use_fake = unseen_row[..., None] & (real_mask[..., None] <= 0)
    else:
        use_fake = unseen_row[..., None]
    feats = jnp.where(use_fake, fake, real)
    mask = jnp.where(unseen_row, jnp.ones_like(real_mask), real_mask)
    return feats, mask


def generic_context_fallback(nb, nbm, adj):
    """Replace EMPTY neighbor rows with the batch's generic context.

    Classes absent from the batch — every unseen class in ZS3 mode,
    since unseen-containing images are filtered — have empty adjacency
    rows, i.e. a zero context vector the generator never sees in
    training (real slots always carry real scene graphs).  Generating
    unseen features from that out-of-distribution input collapses
    zero-shot transfer (measured: unseen mIoU 0.027 vs 0.194 plain on
    the context-tint synthetic split).  The fallback: the classes with
    the highest total adjacency mass — "what a typical region in this
    batch neighbors" — which is in-distribution for the generator and
    the closest batch-computable stand-in for the paper's
    plausible-context prior.
    """
    max_nb = nb.shape[-1]
    mass_vals, mass_idx = jax.lax.top_k(adj.sum(axis=0), max_nb)
    row_empty = (jnp.sum(nbm, axis=-1) == 0)[:, None]  # (C, 1)
    nb = jnp.where(row_empty, mass_idx[None, :].astype(jnp.int32), nb)
    nbm = jnp.where(row_empty, (mass_vals > 0).astype(jnp.float32)[None, :], nbm)
    return nb, nbm


def make_zs3_step(
    model,
    generator,
    cfg: Config,
    num_classes: int,
    unseen_mask: jax.Array,
    graph_context: bool,
    donate: bool = True,
    int8_scales: Optional[Dict] = None,
):
    """One fused jit step: features -> sample -> gen MMD update -> cls CE update.

    `int8_scales` (calibrated trunk activation absmaxes) runs the frozen
    trunk's feature extraction with s8 x s8 MXU convs inside the same
    fused program — the trunk is gradient-free here, so this is pure
    inference acceleration of the step's dominant cost.
    """
    budget = cfg.gmmn.pixels_per_class
    noise_dim = cfg.gmmn.noise_dim
    sigmas = cfg.gmmn.mmd_sigmas
    backend = cfg.gmmn.mmd_backend
    if backend == "auto":
        # Mosaic kernels are TPU-only: every other backend (cpu, gpu)
        # takes the XLA-fused jnp oracle.
        backend = (
            "pallas"
            if budget >= 512 and jax.default_backend() == "tpu"
            else "jnp"
        )
    if backend == "pallas":
        # interpret mode lets the Pallas path run on CPU (tests/smoke).
        mmd_fn = functools.partial(
            batched_pallas_mmd_loss, interpret=jax.default_backend() == "cpu"
        )
    else:
        mmd_fn = batched_mmd_loss
    max_nb = cfg.gmmn.max_graph_neighbors
    self_training = cfg.gmmn.self_training
    seen_mask_f = 1.0 - unseen_mask  # (C,)

    def gen_apply(params, embeddings, emb_idx, noise, neighbors, nb_mask):
        """(C, P, ...) generation, optionally graph-conditioned.

        neighbors/nb_mask are per-slot: (C, P, K) class ids + validity."""
        emb = embeddings[emb_idx]  # (C, embed_dim)
        emb_b = jnp.broadcast_to(emb[:, None], (emb.shape[0], noise.shape[1], emb.shape[1]))
        if graph_context:
            nb_emb = embeddings[neighbors]  # (C, P, K, embed_dim)
            return generator.apply(
                {"params": params}, emb_b, noise, nb_emb, nb_mask
            )
        return generator.apply({"params": params}, emb_b, noise)

    @functools.partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step(
        gen_state: GenState,
        cls_state: ClsState,
        trunk_variables,
        embeddings: jax.Array,
        batch: Dict[str, jax.Array],
        rng: jax.Array,
    ):
        r_sample, r_noise1, r_noise2, r_flip = jax.random.split(
            jax.random.fold_in(rng, gen_state.step), 4
        )
        images, batch_labels = batch["image"], batch["label"]
        if cfg.data.device_preprocess:
            from zs3_tpu.data.transforms import (
                batched_normalize_device,
                batched_random_flip_device,
            )

            images = batched_normalize_device(images)
            images, batch_labels = batched_random_flip_device(
                images, batch_labels, r_flip
            )
        # 1. frozen-trunk feature extraction (eval-mode BN, no dropout);
        # trace-time quantized() context, same mechanism as the eval/
        # serve surfaces (zs3_tpu.quant module docstring)
        import contextlib

        from zs3_tpu import quant

        int8_ctx = (
            quant.quantized(int8_scales)
            if int8_scales
            else contextlib.nullcontext()
        )
        with int8_ctx:
            feats = model.apply(
                trunk_variables, images, train=False, method="forward_features"
            )
        b, h, w, d = feats.shape
        labels = downsample_labels(batch_labels, (h, w))
        flat_feats = feats.reshape(-1, d).astype(jnp.float32)
        flat_labels = labels.reshape(-1)
        real, real_mask, pix_idx = sample_class_pixels(
            flat_feats, flat_labels, num_classes, budget, r_sample,
            return_indices=True,
        )
        # Graph conditioning (paper's per-scene spatial-context priors):
        # each sampled pixel conditions on ITS image's class-adjacency
        # graph; slots without a real pixel (notably every unseen-class
        # slot) fall back to the batch-level co-occurrence graph.
        if graph_context:
            from zs3_tpu.ops.sampling import per_image_adjacency

            adj_img = per_image_adjacency(batch_labels, num_classes)  # (B,C,C)
            nb_img, nbm_img = jax.vmap(
                lambda a: neighbor_lists_from_adjacency(a, max_nb)
            )(adj_img)  # (B, C, K)
            img_ids = pix_idx // (h * w)  # (C, P)
            # per-slot gather: out[c, p] = nb_img[img_ids[c, p], c]
            nb_pix = jax.vmap(lambda nb, ids: nb[ids])(
                nb_img.transpose(1, 0, 2), img_ids
            )  # (C, P, K)
            nbm_pix = jax.vmap(lambda m, ids: m[ids])(
                nbm_img.transpose(1, 0, 2), img_ids
            )
            adj_b = class_adjacency(batch_labels, num_classes)
            nb_batch, nbm_batch = neighbor_lists_from_adjacency(adj_b, max_nb)
            # Unseen classes are absent from ZS3 batches -> empty rows;
            # give them the generic scene context (see the helper).
            nb_batch, nbm_batch = generic_context_fallback(
                nb_batch, nbm_batch, adj_b
            )
            has_pixel = real_mask[..., None] > 0  # (C, P, 1)
            neighbors = jnp.where(
                has_pixel, nb_pix, nb_batch[:, None, :]
            ).astype(jnp.int32)
            nb_mask = jnp.where(has_pixel, nbm_pix, nbm_batch[:, None, :])
        else:
            neighbors = jnp.zeros((num_classes, budget, max_nb), jnp.int32)
            nb_mask = jnp.zeros((num_classes, budget, max_nb), jnp.float32)
        emb_idx = jnp.arange(num_classes)

        # 2. generator MMD step over seen classes present in the batch
        noise1 = jax.random.normal(r_noise1, (num_classes, budget, noise_dim))

        mmd_fake_mask, mmd_real_mask = mmd_training_masks(
            real_mask, seen_mask_f, self_training
        )

        def gen_loss_fn(gp):
            fake = gen_apply(gp, embeddings, emb_idx, noise1, neighbors, nb_mask)
            return mmd_fn(fake, real, mmd_fake_mask, mmd_real_mask, sigmas)

        mmd, gen_grads = jax.value_and_grad(gen_loss_fn)(gen_state.params)
        gen_state = gen_state.apply_gradients(grads=gen_grads)

        # 3. classifier retrain on real-seen + generated-unseen features
        noise2 = jax.random.normal(r_noise2, (num_classes, budget, noise_dim))
        fake_all = gen_apply(
            gen_state.params, embeddings, emb_idx, noise2, neighbors, nb_mask
        )
        cls_feats, cls_mask = classifier_training_set(
            real, real_mask, fake_all, unseen_mask, self_training
        )
        def cls_loss_fn(cp):
            logits = (
                jnp.einsum(
                    "cpd,dk->cpk",
                    cls_feats,
                    cp["kernel"],
                    preferred_element_type=jnp.float32,
                )
                + cp["bias"]
            )
            logp = jax.nn.log_softmax(logits, axis=-1)
            # row c's label is c: select the diagonal via a one-hot
            # contraction (take_along_axis gathers are slow on TPU).
            eye = jnp.eye(num_classes, dtype=logp.dtype)
            nll = -jnp.einsum("cpk,ck->cp", logp, eye)
            return jnp.sum(nll * cls_mask) / jnp.maximum(jnp.sum(cls_mask), 1.0)

        ce, cls_grads = jax.value_and_grad(cls_loss_fn)(cls_state.params)
        cls_state = cls_state.apply_gradients(grads=cls_grads)
        return gen_state, cls_state, {"mmd": mmd, "cls_ce": ce}

    return step


def make_zs3_eval_step(model, num_classes: int, ignore_index: int):
    from zs3_tpu.ops.pallas_eval import predict_labels

    @jax.jit
    def eval_step(trunk_variables, cls_params, batch):
        variables = splice_classifier(trunk_variables, cls_params)
        feats = model.apply(
            variables, batch["image"], train=False, method="forward_features"
        )
        logits = model.apply(variables, feats, method="classify")
        pred = predict_labels(
            logits.astype(jnp.float32), batch["image"].shape[1:3]
        )
        return confusion_matrix(batch["label"], pred, num_classes, ignore_index)

    return eval_step


class GMMNTrainer:
    """Step 2 of the pipeline: zero-shot transfer via generated features."""

    # Checkpoint namespace: subclasses MUST override so different stages
    # never share an experiment root (auto-resume picks the newest
    # experiment under "<checkname><suffix>" — a shared suffix would let
    # a ZS5 run shadow a ZS3 one).
    checkpoint_suffix = "-gmmn"

    def __init__(
        self,
        cfg: Config,
        seg_variables: Optional[Dict[str, Any]] = None,
        mesh=None,
        saver: Optional[Saver] = None,
    ):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(cfg.train.mesh_axes)
        self.train_loader, self.val_loader, num_classes = make_data_loader(cfg.data)
        self.num_classes = num_classes
        import dataclasses

        if cfg.model.num_classes != num_classes:
            cfg = cfg.replace(
                model=dataclasses.replace(cfg.model, num_classes=num_classes)
            )
            self.cfg = cfg
        self.model = build_deeplab(cfg.model)
        rng = jax.random.key(cfg.train.seed)
        self.rng, init_rng, gen_rng = jax.random.split(rng, 3)

        # Trunk: from the supervised checkpoint (cfg.train.resume) or fresh.
        if seg_variables is None:
            dummy = jnp.zeros((1, cfg.data.crop_size, cfg.data.crop_size, 3))
            seg_variables = jax.jit(
                lambda r: self.model.init(r, dummy, train=False)
            )(init_rng)
            if not cfg.train.resume:
                import warnings

                warnings.warn(
                    "GMMNTrainer is starting from a RANDOMLY INITIALIZED "
                    "trunk (no seg_variables and no --resume checkpoint): "
                    "extracted features are meaningless and zero-shot "
                    "training will not transfer. Pass the supervised "
                    "seen-classes checkpoint via train.resume.",
                    stacklevel=2,
                )
            if cfg.train.resume:
                seg_state = create_seg_state(
                    self.model, cfg, init_rng,
                    (1, cfg.data.crop_size, cfg.data.crop_size, 3),
                    total_steps=1, init_variables=seg_variables,
                )
                restored = Saver.restore(cfg.train.resume, seg_state)
                seg_variables = {
                    "params": restored.params,
                    "batch_stats": restored.batch_stats,
                }
        self.trunk_variables = replicate(seg_variables, self.mesh)

        # Class names -> embeddings
        if cfg.data.dataset == "synthetic":
            if cfg.data.embedding_path is None:
                # The synthetic dataset's class appearance is a linear
                # function of these embeddings — condition on the SAME
                # ones so zero-shot transfer is well-posed (and testable).
                from zs3_tpu.data.synthetic import synthetic_class_embeddings

                emb = synthetic_class_embeddings(num_classes, cfg.gmmn.embed_dim)
            else:
                # Synthetic classes are named class_<i>, and there are
                # num_classes of them — not VOC's 21-name registry.
                emb = load_class_embeddings(
                    [f"class_{i}" for i in range(num_classes)],
                    cfg.data.embedding_path,
                    cfg.gmmn.embed_dim,
                )
        else:
            names = (
                CONTEXT_CLASSES if cfg.data.dataset == "context" else VOC_CLASSES
            )
            emb = load_class_embeddings(
                names, cfg.data.embedding_path, cfg.gmmn.embed_dim
            )
        if emb.shape[1] != cfg.gmmn.embed_dim:
            raise ValueError(
                f"embedding file {cfg.data.embedding_path!r} has dim "
                f"{emb.shape[1]}, but gmmn.embed_dim={cfg.gmmn.embed_dim} "
                f"(the generator was sized for the latter; set "
                f"gmmn.embed_dim to match the file)"
            )
        self.embeddings = replicate(jnp.asarray(emb), self.mesh)

        self.unseen = tuple(cfg.data.unseen_classes)
        unseen_mask = np.zeros((num_classes,), np.float32)
        unseen_mask[list(self.unseen)] = 1.0
        self.unseen_mask = jnp.asarray(unseen_mask)

        # Generator
        self.generator = build_gmmn(cfg.gmmn)
        if cfg.gmmn.graph_context:
            k = cfg.gmmn.max_graph_neighbors
            gen_vars = self.generator.init(
                gen_rng,
                jnp.zeros((1, cfg.gmmn.embed_dim)),
                jnp.zeros((1, cfg.gmmn.noise_dim)),
                jnp.zeros((1, k, cfg.gmmn.embed_dim)),
                jnp.zeros((1, k)),
            )
        else:
            gen_vars = self.generator.init(
                gen_rng,
                jnp.zeros((1, cfg.gmmn.embed_dim)),
                jnp.zeros((1, cfg.gmmn.noise_dim)),
            )
        gen_state = GenState.create(
            apply_fn=self.generator.apply,
            params=gen_vars["params"],
            tx=optax.adam(cfg.optim.gmmn_lr),
        )
        # Classifier: start from the trunk's trained classifier
        cls_params = extract_classifier(seg_variables)
        cls_state = ClsState.create(
            apply_fn=None,
            params=cls_params,
            tx=optax.adam(cfg.optim.classifier_lr),
        )
        # Resume a GMMN-stage checkpoint ({"gen","cls"} payload written by
        # validate()) to continue generator training or evaluate zero-shot.
        if cfg.train.gmmn_resume:
            restored = Saver.restore(
                cfg.train.gmmn_resume, {"gen": gen_state, "cls": cls_state}
            )
            gen_state, cls_state = restored["gen"], restored["cls"]
        self.gen_state = replicate(gen_state, self.mesh)
        self.cls_state = replicate(cls_state, self.mesh)
        self.step_fn = make_zs3_step(
            self.model,
            self.generator,
            cfg,
            num_classes,
            self.unseen_mask,
            cfg.gmmn.graph_context,
            donate=cfg.train.donate_state,
            int8_scales=(
                self._trunk_int8_scales() if cfg.train.int8_features else None
            ),
        )
        if tuple(cfg.train.eval_scales) != (1.0,) or cfg.train.eval_flip:
            from zs3_tpu.metrics.tta import make_tta_eval_step

            tta = make_tta_eval_step(
                lambda v, x: self.model.apply(v, x, train=False),
                num_classes,
                cfg.data.ignore_index,
                cfg.train.eval_scales,
                cfg.train.eval_flip,
            )
            self.eval_fn = lambda trunk, cls, batch: tta(
                splice_classifier(trunk, cls), batch
            )
        else:
            self.eval_fn = make_zs3_eval_step(
                self.model, num_classes, cfg.data.ignore_index
            )
        self.saver = saver or Saver(
            cfg.train.checkpoint_dir,
            cfg.data.dataset,
            cfg.train.checkname + self.checkpoint_suffix,
            cfg,
            keep=cfg.train.keep_checkpoints,
        )
        from zs3_tpu.utils.logging import MetricLogger

        self.logger = MetricLogger(self.saver.directory)
        self.best_hiou = 0.0
        if cfg.train.gmmn_resume:
            # Carry best-so-far across a resume (see SeenTrainer).
            self.best_hiou = float(
                Saver.read_meta(cfg.train.gmmn_resume).get("best_metric", 0.0)
            )
        self.steps_per_epoch = cfg.train.steps_per_epoch or len(self.train_loader)

    def _device_batch(self, batch, eval: bool = False):
        from zs3_tpu.core.mesh import device_batch

        return device_batch(batch, self.mesh, self.cfg.data.ignore_index, eval)

    def _train_batches(self):
        from zs3_tpu.core.mesh import bounded_train_batches

        return bounded_train_batches(
            self.train_loader, self.mesh, self.steps_per_epoch
        )

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        from zs3_tpu.core.mesh import prefetch_to_device

        self.train_loader.set_epoch(epoch)
        mmds, ces = [], []
        t0 = time.time()
        for dev_batch in prefetch_to_device(self._train_batches(), self.mesh):
            self.gen_state, self.cls_state, out = self.step_fn(
                self.gen_state,
                self.cls_state,
                self.trunk_variables,
                self.embeddings,
                dev_batch,
                self.rng,
            )
            mmds.append(out["mmd"])
            ces.append(out["cls_ce"])
        stats = {
            "epoch": epoch,
            "mmd": float(jnp.mean(jnp.stack(mmds))) if mmds else float("nan"),
            "cls_ce": float(jnp.mean(jnp.stack(ces))) if ces else float("nan"),
            "epoch_seconds": time.time() - t0,
        }
        self.logger.log(int(jax.device_get(self.gen_state.step)), stats, prefix="train")
        return stats

    def _trunk_int8_scales(self):
        """Calibrated trunk conv-input absmaxes (classifier excluded by
        design — it is the retrained zero-shot head).  Computed once
        from the first val batches; shared by int8_features (quantized
        feature extraction inside the train step) and int8_eval."""
        from zs3_tpu import quant

        if getattr(self, "_int8_scales", None) is None:
            self._int8_scales = quant.calibrate_from_batches(
                self.model.apply,
                self.trunk_variables,
                (
                    self._device_batch(b, eval=True)["image"]
                    for b in self.val_loader
                ),
                apply_kwargs={"train": False, "method": "forward_features"},
                percentile=self.cfg.train.int8_percentile,
            )
        return self._int8_scales

    def _int8_eval_ctx(self):
        """quantized() context for validation when cfg.train.int8_eval —
        or when int8_features trained the classifier against
        int8-computed features, in which case evaluating float would
        measure a trunk the classifier never saw.  Mirrors
        SeenTrainer._int8_eval_ctx otherwise."""
        import contextlib

        if not (self.cfg.train.int8_eval or self.cfg.train.int8_features):
            return contextlib.nullcontext()
        from zs3_tpu import quant

        return quant.quantized(self._trunk_int8_scales())

    def validate(self, epoch: int) -> Dict[str, float]:
        evaluator = Evaluator(
            self.num_classes, self.cfg.data.ignore_index, self.unseen
        )
        with self._int8_eval_ctx():
            for batch in self.val_loader:
                conf = self.eval_fn(
                    self.trunk_variables,
                    self.cls_state.params,
                    self._device_batch(batch, eval=True),
                )
                evaluator.add_confusion(conf)
        report = evaluator.compute()
        self.logger.log(
            int(jax.device_get(self.gen_state.step)), report.as_dict(), prefix="val"
        )
        h = report.harmonic_miou or 0.0
        is_best = h > self.best_hiou
        if is_best:
            self.best_hiou = h
        self.saver.save_checkpoint(
            {"gen": self.gen_state, "cls": self.cls_state},
            int(jax.device_get(self.gen_state.step)),
            self.best_hiou,
            is_best=is_best,
            extra={"epoch": epoch, **report.as_dict()},
        )
        return report.as_dict()

    def fit(self) -> Dict[str, float]:
        stats: Dict[str, float] = {}
        report: Dict[str, float] = {}
        validated = False
        for epoch in range(self.cfg.train.epochs):
            stats = self.train_epoch(epoch)
            # eval_interval <= 0 means "never validate" (like --no-val)
            # rather than a ZeroDivisionError after the first epoch.
            validated = (
                self.cfg.train.eval_interval > 0
                and (epoch + 1) % self.cfg.train.eval_interval == 0
            )
            if validated:
                report = self.validate(epoch)
        if self.cfg.train.epochs and not validated:
            # --no-val / trailing epochs: persist the final gen+cls
            # states (checkpoints are otherwise only written in
            # validate()).
            self.saver.save_checkpoint(
                {"gen": self.gen_state, "cls": self.cls_state},
                int(jax.device_get(self.gen_state.step)),
                self.best_hiou,
                is_best=False,
                extra={"epoch": self.cfg.train.epochs - 1},
            )
        return {**stats, **report}

    def final_variables(self):
        """Full network variables with the retrained classifier."""
        return splice_classifier(
            jax.device_get(self.trunk_variables),
            jax.device_get(self.cls_state.params),
        )
