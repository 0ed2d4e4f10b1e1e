"""Supervised seen-class training (step 1 of the ZS3 pipeline).

Functional parity target: reference train_pascal.py / train_context.py
(class Trainer: training(epoch) / validation(epoch)) — DeepLabv3+ on the
seen classes only (unseen-containing images filtered by the dataset),
SGD + poly LR with 1x/10x groups, CE/focal loss with ignore_index=255,
best-checkpoint tracking by mIoU.

TPU-native shape: one jit-compiled `train_step` (grads + BN-stat update
+ optimizer apply fused into a single XLA program, state donated), one
jit `eval_step` returning an on-device confusion matrix, batches sharded
over the mesh `data` axis.  The reference's DataParallel scatter/gather
and SyncBN rendezvous have no equivalent here — XLA's partitioner
handles both.
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from zs3_tpu.core.config import Config
from zs3_tpu.core.mesh import make_mesh, replicate
from zs3_tpu.data.loader import make_data_loader
from zs3_tpu.metrics.evaluator import Evaluator
from zs3_tpu.models.deeplab import build_deeplab
from zs3_tpu.ops.confusion import confusion_matrix
from zs3_tpu.train.state import SegTrainState, create_seg_state
from zs3_tpu.utils.losses import build_seg_loss
from zs3_tpu.utils.saver import Saver


def make_train_step(
    loss_fn: Callable,
    donate: bool = True,
    device_preprocess: bool = False,
    loss_at: str = "full",
    in_shardings=None,
    out_shardings=None,
    grad_accum: int = 1,
    mesh=None,
    qat: bool = False,
):
    """jit-compiled supervised train step.

    in_shardings/out_shardings (optional) forward to jax.jit — used by
    parallel.spatial to pin a (data x space) batch layout; the default
    lets shardings propagate from the inputs (plain data parallelism).

    grad_accum > 1 splits the incoming batch into `grad_accum`
    microbatches and lax.scan's over them inside the SAME jit program:
    activation memory is bounded by the microbatch while the optimizer
    sees the mean gradient of the full batch (one optimizer step per
    loader batch, so LR-schedule/step semantics are unchanged).  BN
    statistics update sequentially per microbatch — the same contract
    as accumulating with small batches in the reference's torch loop —
    and each microbatch draws an independent dropout key.  `mesh` (when
    given) pins the microbatch dimension's sharding to the `data` axis
    so the reshape cannot re-layout the batch across devices.
    """
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
    jit_kwargs = {}
    if in_shardings is not None:
        jit_kwargs["in_shardings"] = in_shardings
    if out_shardings is not None:
        jit_kwargs["out_shardings"] = out_shardings

    @functools.partial(
        jax.jit, donate_argnums=(0,) if donate else (), **jit_kwargs
    )
    def train_step(
        state: SegTrainState, batch: Dict[str, jax.Array], rng: jax.Array
    ) -> Tuple[SegTrainState, Dict[str, jax.Array]]:
        step_rng = jax.random.fold_in(rng, state.step)
        images, labels = batch["image"], batch["label"]
        if device_preprocess:
            from zs3_tpu.data.transforms import (
                batched_normalize_device,
                batched_random_flip_device,
            )

            flip_rng, step_rng = jax.random.split(step_rng)
            images = batched_normalize_device(images)
            images, labels = batched_random_flip_device(images, labels, flip_rng)

        def micro_loss(params, stats, images, labels, drop_rng):
            import contextlib

            from zs3_tpu import quant

            variables = {"params": params, "batch_stats": stats}
            kwargs = dict(
                train=True,
                deterministic=False,
                rngs={"dropout": drop_rng},
                mutable=["batch_stats"],
            )
            # TRACE-time switch: this body runs while jit traces, so
            # entering qat() here makes every eligible conv emit
            # fake-quant ops into the compiled step.
            qat_ctx = quant.qat() if qat else contextlib.nullcontext()
            with qat_ctx:
                return _micro_loss_body(
                    params, stats, images, labels, variables, kwargs
                )

        def _micro_loss_body(params, stats, images, labels, variables, kwargs):
            if loss_at == "feature":
                # loss at the os4 grid: labels downsample (nearest), the
                # 513^2 x C logits chain never exists.
                feats, updates = state.apply_fn(
                    variables, images, method="forward_features", **kwargs
                )
                logits = state.apply_fn(
                    {"params": params, "batch_stats": stats},
                    feats,
                    method="classify",
                )
                from zs3_tpu.ops.resize import resize_nearest

                small = resize_nearest(labels, logits.shape[1:3])
                loss = loss_fn(logits.astype(jnp.float32), small)
            else:
                logits, updates = state.apply_fn(
                    variables, images, **kwargs
                )
                loss = loss_fn(logits, labels)
            return loss, updates["batch_stats"]

        grad_fn = jax.value_and_grad(micro_loss, has_aux=True)

        if grad_accum == 1:
            (loss, new_stats), grads = grad_fn(
                state.params, state.batch_stats, images, labels, step_rng
            )
        else:
            bsz = images.shape[0]
            if bsz % grad_accum:
                raise ValueError(
                    f"batch size {bsz} is not divisible by grad_accum "
                    f"{grad_accum}"
                )
            micro = bsz // grad_accum
            ndev = (
                mesh.shape["data"]
                if mesh is not None and "data" in mesh.axis_names
                else 1
            )
            if ndev > 1 and micro % ndev == 0:
                # Device-local microbatching.  The batch arrives sharded
                # P('data') on dim 0: device d holds the contiguous rows
                # [d*B/D, (d+1)*B/D).  A plain reshape to (accum, micro)
                # takes CONTIGUOUS global slices per microbatch, which
                # crosses shard boundaries and forces GSPMD into a full
                # batch relayout (all-to-all / "involuntary full
                # rematerialization") every step.  Instead split each
                # device's local chunk into `accum` sub-chunks: the
                # reshape->swapaxes->reshape below keeps every element on
                # its original device (verified: no collective in the
                # compiled HLO), at the cost of a fixed interleaving
                # permutation of which samples form which microbatch —
                # irrelevant to the averaged gradient, and BN-stat
                # chaining has no sample-order contract.
                from jax.sharding import NamedSharding, PartitionSpec as P

                sub = micro // ndev

                def split_micro(x, cons3, cons2):
                    y = x.reshape(ndev, grad_accum, sub, *x.shape[1:])
                    y = jax.lax.with_sharding_constraint(y, cons3)
                    y = jnp.swapaxes(y, 0, 1).reshape(
                        grad_accum, micro, *x.shape[1:]
                    )
                    return jax.lax.with_sharding_constraint(y, cons2)

                cons3 = NamedSharding(mesh, P("data"))
                cons2 = NamedSharding(mesh, P(None, "data"))
                images = split_micro(images, cons3, cons2)
                labels = split_micro(labels, cons3, cons2)
            else:
                # Single device, or a degenerate micro < n_devices
                # split: plain contiguous microbatches.
                images = images.reshape(grad_accum, micro, *images.shape[1:])
                labels = labels.reshape(grad_accum, micro, *labels.shape[1:])
            micro_rngs = jax.random.split(step_rng, grad_accum)

            def body(carry, xs):
                stats, grad_sum, loss_sum = carry
                mb_images, mb_labels, mb_rng = xs
                (mb_loss, mb_stats), mb_grads = grad_fn(
                    state.params, stats, mb_images, mb_labels, mb_rng
                )
                grad_sum = jax.tree.map(jnp.add, grad_sum, mb_grads)
                return (mb_stats, grad_sum, loss_sum + mb_loss), None

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (new_stats, grad_sum, loss_sum), _ = jax.lax.scan(
                body,
                (state.batch_stats, zero_grads, jnp.zeros((), jnp.float32)),
                (images, labels, micro_rngs),
            )
            grads = jax.tree.map(lambda g: g / grad_accum, grad_sum)
            loss = loss_sum / grad_accum

        new_state = state.apply_gradients(grads=grads)
        new_state = new_state.replace(batch_stats=new_stats)
        return new_state, {"loss": loss}

    return train_step


def make_eval_step(num_classes: int, ignore_index: int = 255):
    from zs3_tpu.ops.pallas_eval import predict_labels

    @jax.jit
    def eval_step(
        state: SegTrainState, batch: Dict[str, jax.Array]
    ) -> jax.Array:
        variables = state.eval_variables()
        # classify at the feature grid, then the fused Pallas
        # upsample+argmax (full-res logits never hit HBM on TPU).
        feats = state.apply_fn(
            variables, batch["image"], train=False, method="forward_features"
        )
        logits = state.apply_fn(variables, feats, method="classify")
        pred = predict_labels(
            logits.astype(jnp.float32), batch["image"].shape[1:3]
        )
        return confusion_matrix(batch["label"], pred, num_classes, ignore_index)

    return eval_step


class SeenTrainer:
    """Drives the supervised training loop end to end."""

    def __init__(self, cfg: Config, mesh=None, saver: Optional[Saver] = None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(cfg.train.mesh_axes)
        self.train_loader, self.val_loader, num_classes = make_data_loader(cfg.data)
        if cfg.model.num_classes != num_classes:
            import dataclasses

            cfg = cfg.replace(
                model=dataclasses.replace(cfg.model, num_classes=num_classes)
            )
            self.cfg = cfg
        self.model = build_deeplab(cfg.model)
        steps_per_epoch = cfg.train.steps_per_epoch or len(self.train_loader)
        self.steps_per_epoch = steps_per_epoch
        total_steps = steps_per_epoch * cfg.train.epochs
        rng = jax.random.key(cfg.train.seed)
        self.rng, init_rng = jax.random.split(rng)
        self.state = create_seg_state(
            self.model,
            cfg,
            init_rng,
            (1, cfg.data.crop_size, cfg.data.crop_size, 3),
            total_steps,
        )
        if cfg.train.resume:
            restored = Saver.restore(cfg.train.resume, self.state)
            if cfg.train.finetune:
                # --ft semantics: weights only, fresh optimizer/schedule.
                self.state = self.state.replace(
                    params=restored.params, batch_stats=restored.batch_stats
                )
            else:
                self.state = restored
        self.state = replicate(self.state, self.mesh)
        class_weights = None
        if cfg.optim.use_balanced_weights:
            from zs3_tpu.utils.losses import compute_dataset_class_weights

            # Key the cache by everything that changes the filtered train
            # set — dataset alone would silently reuse a histogram from a
            # different unseen split / SBD / weak-label configuration.
            split_tag = (
                "-".join(str(c) for c in cfg.data.unseen_classes) or "none"
            )
            variant = ("_sbd" if cfg.data.use_sbd else "") + (
                "_weak" if cfg.data.weak_label_dir else ""
            )
            cache = (
                f"{cfg.train.checkpoint_dir}/{cfg.data.dataset}"
                f"_u{split_tag}{variant}_class_hist.npy"
            )
            class_weights = compute_dataset_class_weights(
                self.train_loader.dataset,
                num_classes,
                cfg.data.ignore_index,
                cache_path=cache,
            )
        self.loss_fn = build_seg_loss(
            cfg.optim.loss_type, cfg.data.ignore_index, class_weights
        )
        self.train_step = make_train_step(
            self.loss_fn,
            cfg.train.donate_state,
            cfg.data.device_preprocess,
            cfg.optim.loss_at,
            grad_accum=cfg.train.grad_accum,
            mesh=self.mesh,
            qat=cfg.train.qat,
        )
        if tuple(cfg.train.eval_scales) != (1.0,) or cfg.train.eval_flip:
            # ms+flip TTA (DeepLab-lineage reporting mode; reference is
            # single-scale, which stays the default path below).
            from zs3_tpu.metrics.tta import make_tta_eval_step

            tta = make_tta_eval_step(
                lambda v, x: self.model.apply(v, x, train=False),
                num_classes,
                cfg.data.ignore_index,
                cfg.train.eval_scales,
                cfg.train.eval_flip,
            )
            self.eval_step = lambda state, batch: tta(
                state.eval_variables(), batch
            )
        else:
            self.eval_step = make_eval_step(num_classes, cfg.data.ignore_index)
        self.num_classes = num_classes
        self.saver = saver or Saver(
            cfg.train.checkpoint_dir,
            cfg.data.dataset,
            cfg.train.checkname,
            cfg,
            keep=cfg.train.keep_checkpoints,
        )
        from zs3_tpu.utils.logging import MetricLogger

        self.logger = MetricLogger(
            self.saver.directory, tensorboard=cfg.train.tensorboard
        )
        self.best_metric = 0.0
        self._int8_scales = None
        if cfg.train.resume and not cfg.train.finetune:
            # Carry the best-so-far across a resume so a post-crash
            # validation can't re-point 'best' at a worse model.
            self.best_metric = float(
                Saver.read_meta(cfg.train.resume).get("best_metric", 0.0)
            )
        self.history = []

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
        losses = []
        t0 = time.time()
        for i, dev_batch in enumerate(
            prefetch_to_device(self._train_batches(), self.mesh)
        ):
            self.state, out = self.train_step(self.state, dev_batch, self.rng)
            losses.append(out["loss"])
            if self.cfg.train.log_every and (i + 1) % self.cfg.train.log_every == 0:
                self.logger.log(
                    int(jax.device_get(self.state.step)),
                    {"loss": float(out["loss"])},
                    prefix="train_step",
                )
        loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
        dt = time.time() - t0
        stats = {"epoch": epoch, "train_loss": loss, "epoch_seconds": dt}
        self.logger.log(int(jax.device_get(self.state.step)), stats, prefix="train")
        self.history.append(stats)
        return stats

    def _int8_eval_ctx(self):
        """quantized() context for validation when cfg.train.int8_eval.

        Calibrates once from the first two val batches (exactly the
        tensors the eval step consumes).  The eval jits trace on first
        call, which happens inside this context in validate(), so the
        cached executables are consistently quantized for the
        trainer's lifetime (int8_eval is frozen config).
        """
        import contextlib

        if not self.cfg.train.int8_eval:
            return contextlib.nullcontext()
        from zs3_tpu import quant

        if self._int8_scales is None:
            self._int8_scales = quant.calibrate_from_batches(
                self.model.apply,
                self.state.eval_variables(),
                (
                    self._device_batch(b, eval=True)["image"]
                    for b in self.val_loader
                ),
                apply_kwargs={"train": False},
                percentile=self.cfg.train.int8_percentile,
            )
        return quant.quantized(self._int8_scales)

    def validate(self, epoch: int) -> Dict[str, float]:
        evaluator = Evaluator(
            self.num_classes,
            self.cfg.data.ignore_index,
            self.cfg.data.unseen_classes,
        )
        panel_batch = None
        with self._int8_eval_ctx():
            for batch in self.val_loader:
                if panel_batch is None:
                    panel_batch = batch
                conf = self.eval_step(
                    self.state, self._device_batch(batch, eval=True)
                )
                evaluator.add_confusion(conf)
            if self.cfg.train.tensorboard and panel_batch is not None:
                # inside the int8 ctx: _panel_predict traces on first
                # use, so under int8_eval the logged prediction panels
                # show the SAME quantized model the metrics measure
                self._log_panels(panel_batch)
        report = evaluator.compute()
        self.logger.log(
            int(jax.device_get(self.state.step)), report.as_dict(), prefix="val"
        )
        metric = report.miou
        is_best = metric > self.best_metric
        if is_best:
            self.best_metric = metric
        self.saver.save_checkpoint(
            self.state,
            int(jax.device_get(self.state.step)),
            self.best_metric,
            is_best=is_best,
            extra={"epoch": epoch, **report.as_dict()},
        )
        return report.as_dict()

    @functools.cached_property
    def _panel_predict(self):
        # Built once: defining the jit inside _log_panels would create a
        # fresh closure per validation, forcing a full-model recompile
        # every epoch with tensorboard on.
        @jax.jit
        def predict(state, images):
            logits = state.apply_fn(state.eval_variables(), images, train=False)
            return jnp.argmax(logits, axis=-1)

        return predict

    def _log_panels(self, batch):
        """Input / GT / prediction color panels (reference
        TensorboardSummary.visualize_image)."""
        import numpy as np

        from zs3_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
        from zs3_tpu.utils.viz import decode_segmap

        dev = self._device_batch(batch, eval=True)
        pred = np.asarray(
            jax.device_get(self._panel_predict(self.state, dev["image"]))
        )[0]
        img = np.asarray(batch["image"][0])
        img = np.clip((img * IMAGENET_STD + IMAGENET_MEAN) * 255, 0, 255).astype(
            np.uint8
        )
        gt = np.asarray(batch["label"][0])
        step = int(jax.device_get(self.state.step))
        self.logger.log_images(
            step,
            {
                "val/input": img,
                "val/ground_truth": decode_segmap(gt, self.num_classes),
                "val/prediction": decode_segmap(pred, self.num_classes),
            },
        )

    def fit(self) -> Dict[str, float]:
        last_report: Dict[str, float] = {}
        stats: Dict[str, float] = {}
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
                last_report = self.validate(epoch)
        if self.cfg.train.epochs and not validated:
            # --no-val (or trailing epochs past the last eval_interval
            # boundary): still persist the final state — checkpoints are
            # otherwise only written inside validate().
            self.saver.save_checkpoint(
                self.state,
                int(jax.device_get(self.state.step)),
                self.best_metric,
                is_best=False,
                extra={"epoch": self.cfg.train.epochs - 1},
            )
        return {**stats, **last_report}
