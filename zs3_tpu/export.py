"""Serialized model export for deployment (StableHLO via jax.export).

The reference has no deployment story (predictions only materialize
inside validation loops, SURVEY.md §3.5); production serving of the
rebuild needs an artifact that runs without Python model code.  This
exports the inference path — uint8 NHWC images in, int32 label maps (or
f32 logits) out, normalization and trained weights baked into the graph
— as a self-contained StableHLO artifact:

  * loadable from any JAX process (`load_exported`) with no zs3_tpu
    import, checkpoint, or config;
  * loadable from C++ / non-Python runtimes that speak StableHLO
    (PJRT `LoadedExecutable`, IFRT proxy, TF `XlaCallModule`);
  * cross-lowerable: `platforms=("tpu", "cpu")` produces one artifact
    serving both backends, exported from either host.

The upsample+argmax runs the portable oracle (ops/resize.py) rather
than the Mosaic kernel so the artifact stays backend-agnostic; at the
export batch sizes that path is <1% of inference time (DESIGN.md §4).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from zs3_tpu.core.config import Config


def make_inference_fn(
    model, variables, emit: str = "labels", int8_scales=None
) -> Callable:
    """Self-contained inference: uint8 NHWC batch -> labels or logits.

    Weights are closed over (they become constants of the exported
    module), so the artifact needs no side-band checkpoint.
    `int8_scales` (zs3_tpu.quant.calibrate output) bakes the s8 x s8
    MXU conv lowering into the traced program — the artifact itself is
    quantized; loaders need no knowledge of it.
    """
    import contextlib

    from zs3_tpu import quant
    from zs3_tpu.data.transforms import batched_normalize_device

    if emit not in ("labels", "logits"):
        raise ValueError(f"emit must be 'labels' or 'logits', got {emit!r}")

    def infer(images: jax.Array) -> jax.Array:
        x = batched_normalize_device(images)
        ctx = (
            quant.quantized(int8_scales)
            if int8_scales
            else contextlib.nullcontext()
        )
        with ctx:
            # __call__ upsamples to input resolution via the portable
            # align-corners resize (ops/resize.py) — backend-agnostic.
            logits = model.apply(variables, x, train=False).astype(
                jnp.float32
            )
        if emit == "logits":
            return logits
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    return infer


def _checkpoint_keys(path: str) -> set:
    """Top-level pytree keys of an orbax checkpoint (no array loads)."""
    import orbax.checkpoint as ocp

    meta = ocp.StandardCheckpointer().metadata(path)
    tree = getattr(meta, "item_metadata", meta)
    tree = getattr(tree, "tree", tree)
    return set(tree.keys()) if hasattr(tree, "keys") else set()


def restore_retrained_classifier(path: str, num_classes: int) -> dict:
    """Pull the retrained (D, C) classifier out of a GMMN/ZS5-stage
    checkpoint ({"gen","cls"} payload written by GMMNTrainer.validate)."""
    import orbax.checkpoint as ocp

    keys = _checkpoint_keys(path)
    if "cls" not in keys:
        raise ValueError(
            f"{path!r} is not a GMMN-stage checkpoint (top-level keys "
            f"{sorted(keys)}, expected 'gen'/'cls'); pass the seen-stage "
            "trunk via --resume and a train-gmmn/train-zs5 checkpoint "
            "via --gmmn-resume"
        )
    raw = ocp.StandardCheckpointer().restore(path)
    cls = raw["cls"]["params"]
    if cls["kernel"].shape[-1] != num_classes:
        raise ValueError(
            f"retrained classifier in {path!r} has "
            f"{cls['kernel'].shape[-1]} classes, config says {num_classes}"
        )
    return {"kernel": cls["kernel"], "bias": cls["bias"]}


def export_predictor(
    cfg: Config,
    checkpoint: Optional[str] = None,
    gmmn_checkpoint: Optional[str] = None,
    batch_size: int = 1,
    emit: str = "labels",
    platforms: Optional[Sequence[str]] = None,
    allow_random: bool = False,
    int8_calib_images: Optional[Sequence[np.ndarray]] = None,
) -> Tuple[bytes, dict]:
    """Export the (checkpoint-restored) inference path to StableHLO bytes.

    `checkpoint` restores the seen-stage trunk (SegTrainState payload);
    `gmmn_checkpoint` additionally splices the retrained zero-shot
    classifier out of a train-gmmn/train-zs5 {"gen","cls"} checkpoint —
    the actual ZS3 deliverable — exactly as evaluate-gmmn serves it.
    `platforms=None` lowers for the current backend; pass e.g.
    ("tpu", "cpu") for a multi-platform artifact (cross-lowering works
    from any host).  Returns (serialized bytes, manifest dict).
    """
    from jax import export as jexport

    from zs3_tpu.models.deeplab import build_deeplab
    from zs3_tpu.train.state import create_seg_state
    from zs3_tpu.utils.saver import Saver

    model = build_deeplab(cfg.model)
    state = create_seg_state(
        model,
        cfg,
        jax.random.key(cfg.train.seed),
        (1, cfg.data.crop_size, cfg.data.crop_size, 3),
        total_steps=1,
    )
    ckpt = checkpoint or cfg.train.resume
    gmmn_ckpt = gmmn_checkpoint or cfg.train.gmmn_resume
    if ckpt:
        if {"gen", "cls"} <= _checkpoint_keys(ckpt):
            # A gmmn/zs5 checkpoint holds only generator + classifier
            # states, not the trunk — fail with directions instead of an
            # orbax structure-mismatch traceback.
            raise ValueError(
                f"--resume {ckpt!r} is a GMMN-stage checkpoint "
                "(gen/cls payload, no trunk weights); pass the "
                "seen-stage checkpoint via --resume and this one via "
                "--gmmn-resume to export the zero-shot model"
            )
        state = Saver.restore(ckpt, state)
    elif not allow_random:
        # Without this guard a forgotten --resume exports a randomly
        # initialized model into a valid-looking artifact that serves
        # garbage with no error at any point.
        raise ValueError(
            "export without a checkpoint would serialize randomly "
            "initialized weights; pass --resume <ckpt> (or "
            "allow_random=True / --allow-random for a smoke artifact)"
        )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if gmmn_ckpt:
        from zs3_tpu.train.gmmn import splice_classifier

        cls_params = restore_retrained_classifier(
            gmmn_ckpt, cfg.model.num_classes
        )
        variables = splice_classifier(variables, cls_params)
    size = cfg.data.crop_size
    int8_scales = None
    if int8_calib_images is not None:
        from zs3_tpu import quant
        from zs3_tpu.data.transforms import (
            batched_normalize_device,
            letterbox_image,
        )

        canvases = np.stack(
            [
                letterbox_image(np.asarray(img), size)[0]
                for img in int8_calib_images
            ]
        )
        int8_scales = quant.calibrate(
            lambda v, x, **kw: model.apply(
                v, batched_normalize_device(x), **kw
            ),
            variables,
            [canvases],
            apply_kwargs={"train": False},
            percentile=cfg.train.int8_percentile,
        )
    infer = make_inference_fn(model, variables, emit, int8_scales=int8_scales)
    spec = jax.ShapeDtypeStruct((batch_size, size, size, 3), jnp.uint8)
    if platforms is None and jax.default_backend() not in (
        "cpu", "tpu", "cuda", "rocm",
    ):
        # Experimental/relay backends (e.g. a tunneled TPU) are not valid
        # jax.export lowering targets; cross-lower a portable artifact.
        platforms = ("tpu", "cpu")
    exported = jexport.export(
        jax.jit(infer),
        platforms=tuple(platforms) if platforms else None,
    )(spec)
    manifest = {
        "input": f"uint8[{batch_size},{size},{size},3] NHWC",
        "output": (
            f"int32[{batch_size},{size},{size}] labels"
            if emit == "labels"
            else f"float32[{batch_size},{size},{size},{cfg.model.num_classes}] logits"
        ),
        "platforms": list(exported.platforms),
        "backbone": cfg.model.backbone,
        "num_classes": cfg.model.num_classes,
        "batch_size": batch_size,
        "crop_size": size,
        "emit": emit,
        "zero_shot_classifier": bool(gmmn_ckpt),
        # bool() matches make_inference_fn's truthiness: an empty
        # calibration result traces float and must be labeled float.
        "int8": bool(int8_scales),
    }
    return exported.serialize(), manifest


def save_exported(path: str, blob: bytes, manifest: dict) -> None:
    """Write `<path>` (StableHLO bytes) + `<path>.json` (manifest)."""
    import json

    with open(path, "wb") as f:
        f.write(blob)
    with open(path + ".json", "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)


def load_exported(path: str) -> Callable[[np.ndarray], np.ndarray]:
    """Load an exported artifact and return a callable — no model code,
    config, or checkpoint needed."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return lambda images: exported.call(jnp.asarray(images))
