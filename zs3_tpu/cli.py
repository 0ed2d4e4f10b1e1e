"""Single typed CLI mirroring the reference's train/validate entrypoints.

Functional parity target: the reference's per-script argparse mains
(reference: train_pascal.py, train_pascal_GMMN.py, train_context.py,
train_context_GMMN.py, each ~40 flags, heavily copy-pasted).  Here one
entrypoint with subcommands covers all of them:

    python -m zs3_tpu.cli train-seen  --dataset pascal --unseen-split 2 ...
    python -m zs3_tpu.cli train-gmmn  --dataset pascal --unseen-split 2 --resume CKPT
    python -m zs3_tpu.cli train-zs5   --dataset context --unseen-split 10 ...
    python -m zs3_tpu.cli evaluate    --dataset pascal --resume CKPT
    python -m zs3_tpu.cli show-config            # dump the default config

Flags override a JSON config (--config) which overrides defaults; the
resolved config is written into the experiment directory.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
from typing import Optional

from zs3_tpu.core.config import (
    Config,
    context_unseen_split,
    voc_unseen_split,
)


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--config", type=str, default=None, help="JSON config file")
    p.add_argument("--compilation-cache", type=str, metavar="DIR",
                   default=os.environ.get("ZS3_COMPILATION_CACHE"),
                   help="persistent XLA compilation cache directory "
                        "(default: $ZS3_COMPILATION_CACHE); restarts and "
                        "repeated CLI stages skip recompiles of unchanged "
                        "programs")
    p.add_argument("--dataset", choices=["pascal", "context", "synthetic"])
    p.add_argument("--data-root", type=str)
    p.add_argument("--use-sbd", action="store_true", default=None)
    p.add_argument("--backbone",
                   choices=["resnet101", "resnet50", "xception", "mobilenet", "drn"])
    p.add_argument("--out-stride", type=int, choices=[8, 16])
    p.add_argument("--base-size", type=int)
    p.add_argument("--crop-size", type=int)
    p.add_argument("--batch-size", type=int)
    p.add_argument("--grad-accum", type=int,
                   help="microbatches per optimizer step (train-seen): "
                        "batch-size stays the effective batch; activation "
                        "memory drops to batch-size/N per step")
    p.add_argument("--qat", action="store_true", default=None,
                   help="quantization-aware training (train-seen): convs "
                        "train on fake-quantized int8-grid operands so the "
                        "trunk survives int8 deployment (evaluate/infer/"
                        "serve/export --int8) with less accuracy loss")
    p.add_argument("--epochs", type=int)
    p.add_argument("--steps-per-epoch", type=int)
    p.add_argument("--lr", type=float)
    p.add_argument("--lr-scheduler", choices=["poly", "step", "cos", "const"])
    p.add_argument("--nesterov", action="store_true", default=None)
    p.add_argument("--loss-type", choices=["ce", "focal"])
    p.add_argument("--use-balanced-weights", action="store_true", default=None)
    p.add_argument("--seed", type=int)
    p.add_argument("--resume", type=str)
    p.add_argument("--ft", action="store_true", default=None,
                   help="fine-tune: load weights only, fresh optimizer")
    p.add_argument("--gmmn-resume", type=str,
                   help="GMMN-stage checkpoint to resume or evaluate")
    p.add_argument("--checkname", type=str)
    p.add_argument("--checkpoint-dir", type=str)
    p.add_argument("--eval-interval", type=int)
    p.add_argument("--no-val", action="store_true", default=None)
    p.add_argument("--unseen-split", type=int, choices=[0, 2, 4, 6, 8, 10],
                   help="number of unseen classes (paper protocol)")
    p.add_argument("--embedding-path", type=str)
    p.add_argument("--compute-dtype", choices=["bfloat16", "float32"])
    p.add_argument("--fused-tail", action="store_true", default=None,
                   help="fused Pallas classify+resize inference tail "
                        "(TPU, exact-4x geometry; see DESIGN.md §4)")
    p.add_argument("--graph-context", action="store_true", default=None)
    p.add_argument("--pixels-per-class", type=int)
    p.add_argument("--eval-scales", type=str,
                   help="comma-separated TTA scales, e.g. 0.5,0.75,1.0,1.25"
                        " (default: 1.0 = reference single-scale)")
    p.add_argument("--eval-flip", action="store_true", default=None,
                   help="add horizontal-mirror TTA at evaluation")
    p.add_argument("--auto-resume", action="store_true", default=None,
                   help="resume from the newest checkpoint of the newest "
                        "experiment for this (dataset, checkname), if any "
                        "(crash recovery without hunting for paths)")


def build_config(args: argparse.Namespace) -> Config:
    cfg = Config()
    if args.config:
        with open(args.config) as f:
            cfg = Config.from_json(f.read())

    def upd(node, **kw):
        kw = {k: v for k, v in kw.items() if v is not None}
        return dataclasses.replace(node, **kw) if kw else node

    # --no-val: never run validation (reference's flag); an effectively
    # infinite eval interval keeps fit() semantics intact.
    eval_interval = args.eval_interval
    if args.no_val:
        eval_interval = 10**9

    unseen: Optional[tuple] = None
    if args.unseen_split is not None:
        if args.unseen_split == 0:
            unseen = ()
        else:
            dataset = args.dataset or cfg.data.dataset
            unseen = (
                context_unseen_split(args.unseen_split)
                if dataset == "context"
                else voc_unseen_split(args.unseen_split)
            )

    cfg = dataclasses.replace(
        cfg,
        model=upd(
            cfg.model,
            backbone=args.backbone,
            output_stride=args.out_stride,
            compute_dtype=args.compute_dtype,
            fused_tail=args.fused_tail,
        ),
        gmmn=upd(
            cfg.gmmn,
            graph_context=args.graph_context,
            pixels_per_class=args.pixels_per_class,
        ),
        data=upd(
            cfg.data,
            dataset=args.dataset,
            root=args.data_root,
            use_sbd=args.use_sbd,
            base_size=args.base_size,
            crop_size=args.crop_size,
            batch_size=args.batch_size,
            unseen_classes=unseen,
            embedding_path=args.embedding_path,
        ),
        optim=upd(
            cfg.optim,
            lr=args.lr,
            loss_type=args.loss_type,
            use_balanced_weights=args.use_balanced_weights,
            schedule=args.lr_scheduler,
            nesterov=args.nesterov,
        ),
        train=upd(
            cfg.train,
            epochs=args.epochs,
            steps_per_epoch=args.steps_per_epoch,
            grad_accum=args.grad_accum,
            qat=args.qat,
            seed=args.seed,
            resume=args.resume,
            gmmn_resume=args.gmmn_resume,
            finetune=args.ft,
            checkname=args.checkname,
            checkpoint_dir=args.checkpoint_dir,
            eval_interval=eval_interval,
            eval_scales=(
                tuple(float(s) for s in args.eval_scales.split(","))
                if args.eval_scales
                else None
            ),
            eval_flip=args.eval_flip,
        ),
    )
    return cfg


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="zs3_tpu", description="TPU-native zero-shot semantic segmentation"
    )
    sub = parser.add_subparsers(dest="command", required=True)
    for name in (
        "train-seen", "train-gmmn", "train-zs5",
        "evaluate", "evaluate-gmmn", "infer", "convert-weights",
        "show-config", "profile", "serve", "export", "prepare-context",
        "build-embeddings",
    ):
        p = sub.add_parser(name)
        _add_common(p)
        if name in ("train-gmmn", "train-zs5"):
            p.add_argument("--int8-features", action="store_true",
                           help="extract frozen-trunk features with int8 "
                                "MXU convs inside the fused train step "
                                "(~1.4x on the stage's dominant cost; "
                                "trunk is gradient-free here)")
        if name in ("evaluate", "evaluate-gmmn", "infer", "serve", "export",
                    "train-gmmn", "train-zs5"):
            p.add_argument("--int8-percentile", type=float, default=None,
                           metavar="P",
                           help="calibrate int8 activation scales to this "
                                "percentile of |conv input| (e.g. 99.99) "
                                "instead of the absolute max — clips "
                                "outliers to keep 8-bit resolution on the "
                                "bulk of the range (default: absmax)")
        if name in ("evaluate", "evaluate-gmmn"):
            p.add_argument("--int8", action="store_true",
                           help="validate with int8 PTQ convs (calibrated "
                                "on the first val batches) — measures the "
                                "deployment path's mIoU delta")
        if name == "serve":
            p.add_argument("--host", type=str, default="127.0.0.1")
            p.add_argument("--port", type=int, default=8500)
            p.add_argument("--artifact", type=str, default=None,
                           help="serve an exported StableHLO artifact "
                                "(cli export) instead of a checkpoint")
            p.add_argument("--serve-batch", type=int, default=1,
                           help="micro-batch up to N concurrent requests "
                                "onto one jit forward (checkpoint serving "
                                "only; ~Nx loaded throughput)")
            p.add_argument("--int8", action="store_true",
                           help="int8 MXU inference (~1.4x images/sec on "
                                "v5e); requires --calib-images")
            p.add_argument("--calib-images", nargs="+", default=None,
                           help="representative images for int8 "
                                "activation calibration")
        if name == "profile":
            p.add_argument("--steps", type=int, default=10,
                           help="train steps to time (first is warmup)")
            p.add_argument("--trace-dir", type=str, default=None,
                           help="write a jax.profiler XLA trace here "
                                "(TensorBoard/Perfetto-viewable)")
            p.add_argument("--mode", default="train",
                           choices=["train", "fwd", "int8-fwd"],
                           help="what to profile: the train step, the "
                                "inference forward, or the int8 PTQ "
                                "forward (synthetic calibration scales "
                                "-- throughput-faithful, accuracy-"
                                "irrelevant)")
        if name == "infer":
            p.add_argument("images", nargs="+", help="image files to segment")
            p.add_argument("--output", type=str, default="predictions")
            p.add_argument("--no-color", action="store_true")
            p.add_argument("--sliding", action="store_true",
                           help="native-resolution sliding-window inference "
                                "(overlapping crops, averaged probabilities) "
                                "instead of a global resize")
            p.add_argument("--int8", action="store_true",
                           help="int8 MXU inference (~1.4x images/sec on "
                                "v5e); calibrates on the input images")
        elif name == "prepare-context":
            p.add_argument("json", help="detail-API trainval_merged.json")
            p.add_argument("--overwrite", action="store_true",
                           help="regenerate label PNGs that already exist")
        elif name == "build-embeddings":
            p.add_argument("vectors", nargs="+",
                           help="word-vector file(s): word2vec .bin, "
                                "word2vec/fasttext/GloVe text, or existing "
                                ".npy/.npz/.pkl registries; multiple files "
                                "concatenate feature-wise (fastnvec)")
            p.add_argument("--output", type=str, required=True,
                           help="registry .npy to write (rows ordered by "
                                "the dataset's class list; pass via "
                                "--embedding-path to the trainers)")
            p.add_argument("--no-normalize", action="store_true",
                           help="keep raw vector norms (default: unit rows)")
            p.add_argument("--alias", action="append", default=[],
                           metavar="NAME=TOKENS",
                           help="extra class-name alias, e.g. "
                                "'tvmonitor=television'; repeatable")
        elif name == "export":
            p.add_argument("--output", type=str, required=True,
                           help="StableHLO artifact path (+ .json manifest)")
            p.add_argument("--export-batch", type=int, default=1)
            p.add_argument("--emit", choices=["labels", "logits"],
                           default="labels")
            p.add_argument("--platforms", type=str, default=None,
                           help="comma-separated lowering targets, e.g. "
                                "tpu,cpu (default: current backend)")
            p.add_argument("--allow-random", action="store_true",
                           help="permit exporting without a checkpoint "
                                "(randomly initialized weights; smoke "
                                "artifacts only)")
            p.add_argument("--int8", action="store_true",
                           help="bake int8 MXU convs into the artifact "
                                "(~1.4x images/sec on v5e); requires "
                                "--calib-images")
            p.add_argument("--calib-images", nargs="+", default=None,
                           help="representative images for int8 "
                                "activation calibration")
        elif name == "convert-weights":
            p.add_argument("pth", help="upstream-named backbone state_dict "
                           ".pth (torchvision resnet, reference xception/"
                           "mobilenet/drn namings)")
            p.add_argument("--output", type=str, required=True,
                           help="checkpoint directory to write (use with --resume --ft)")
            p.add_argument("--force", action="store_true",
                           help="replace an existing --output checkpoint")
    args = parser.parse_args(argv)
    if getattr(args, "compilation_cache", None):
        import jax

        os.makedirs(args.compilation_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", args.compilation_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    cfg = build_config(args)
    if getattr(args, "int8_percentile", None) is not None:
        cfg = cfg.replace(
            train=dataclasses.replace(
                cfg.train, int8_percentile=args.int8_percentile
            )
        )
    if getattr(args, "int8_features", None):
        cfg = cfg.replace(
            train=dataclasses.replace(cfg.train, int8_features=True)
        )

    if getattr(args, "auto_resume", None):
        from zs3_tpu.utils.saver import Saver

        # Each stage checkpoints under its own namespace ("<checkname>"
        # for seen, "<checkname>-gmmn" for ZS3, "<checkname>-zs5" for
        # ZS5) so auto-resume can never restore a different stage's
        # states; GMMN-stage trainers resume through gmmn_resume.
        suffix = {"train-gmmn": "-gmmn", "train-zs5": "-zs5"}.get(
            args.command, ""
        )
        checkname = cfg.train.checkname + suffix
        field = "gmmn_resume" if suffix else "resume"
        exp = Saver.latest_experiment(
            cfg.train.checkpoint_dir, cfg.data.dataset, checkname
        )
        if exp and not getattr(cfg.train, field):
            ckpt = Saver.latest_checkpoint(exp)
            cfg = cfg.replace(
                train=dataclasses.replace(cfg.train, **{field: ckpt})
            )
            print(f"auto-resume: {ckpt}", file=sys.stderr)

    if args.command == "show-config":
        print(cfg.to_json())
        return 0

    if args.command == "train-seen":
        from zs3_tpu.train.seen import SeenTrainer

        result = SeenTrainer(cfg).fit()
    elif args.command == "train-gmmn":
        from zs3_tpu.train.gmmn import GMMNTrainer

        result = GMMNTrainer(cfg).fit()
    elif args.command == "train-zs5":
        from zs3_tpu.train.self_training import ZS5Trainer

        trainer = ZS5Trainer(cfg)
        n = trainer.pseudo_label()
        print(f"pseudo-labeled {n} images", file=sys.stderr)
        result = trainer.fit()
    elif args.command == "evaluate":
        from zs3_tpu.train.seen import SeenTrainer

        if args.int8:
            cfg = cfg.replace(
                train=dataclasses.replace(cfg.train, int8_eval=True)
            )
        trainer = SeenTrainer(cfg)
        result = trainer.validate(epoch=0)
    elif args.command == "evaluate-gmmn":
        from zs3_tpu.train.gmmn import GMMNTrainer

        if args.int8:
            cfg = cfg.replace(
                train=dataclasses.replace(cfg.train, int8_eval=True)
            )
        result = GMMNTrainer(cfg).validate(epoch=0)
    elif args.command == "infer":
        from zs3_tpu.train.predict import Predictor

        predictor = Predictor(cfg)
        n_quant = 0
        if args.int8:
            import numpy as np
            from PIL import Image as PILImage

            calib = [
                np.asarray(PILImage.open(p).convert("RGB"))
                for p in args.images[:8]
            ]
            n_quant = predictor.quantize(
                calib, percentile=cfg.train.int8_percentile
            )
            print(f"int8: quantized {n_quant} convs", file=sys.stderr)
        written = predictor.predict_files(
            args.images, args.output, colorize=not args.no_color,
            sliding=args.sliding,
        )
        result = {"written": len(written), "output": args.output}
        if args.int8:
            result["int8_convs"] = n_quant
    elif args.command == "serve":
        from zs3_tpu.serve import InferenceServer

        if args.int8 and not args.calib_images:
            raise SystemExit("serve --int8 requires --calib-images")
        if args.int8 and args.artifact:
            raise SystemExit(
                "serve --int8 applies to checkpoint serving; for artifact "
                "serving, export with --int8 instead"
            )
        server = InferenceServer(
            cfg, host=args.host, port=args.port, artifact=args.artifact,
            serve_batch=args.serve_batch,
            int8_calib_images=args.calib_images if args.int8 else None,
        )
        print(
            json.dumps({"serving": f"http://{args.host}:{server.port}"}),
            file=sys.stderr,
        )
        server.serve_forever()
        return 0
    elif args.command == "profile":
        # Timed (optionally XLA-traced) train steps on one real batch:
        # the reference has no profiler at all (SURVEY.md §5); this is
        # the per-step observability entry point.
        import contextlib

        from zs3_tpu.train.seen import SeenTrainer
        from zs3_tpu.utils.profiling import StepTimer, force
        from zs3_tpu.utils.profiling import trace as profiler_trace

        trainer = SeenTrainer(cfg)
        batch = trainer._device_batch(next(iter(trainer.train_loader)))
        if args.mode in ("fwd", "int8-fwd"):
            # Inference forward (optionally int8) — the headline metric's
            # shape, now profileable in place (PROFILE_r04 methodology).
            import jax
            import jax.numpy as jnp

            from zs3_tpu import quant

            scales = (
                quant.default_conv_scales(trainer.state.params)
                if args.mode == "int8-fwd"
                else None
            )

            def fwd_fn(variables, images):
                ctx = (
                    quant.quantized(scales)
                    if scales
                    else contextlib.nullcontext()
                )
                with ctx:  # trace-time switch: inside the jit trace
                    logits = trainer.state.apply_fn(
                        variables, images, train=False
                    )
                return jnp.sum(logits.astype(jnp.float32))

            fwd = jax.jit(fwd_fn)
            variables = trainer.state.eval_variables()

            def run_once():
                force(fwd(variables, batch["image"]))

        else:

            def run_once():
                trainer.state, out = trainer.train_step(
                    trainer.state, batch, trainer.rng
                )
                force(out["loss"])

        timer = StepTimer(warmup=1)
        ctx = (
            profiler_trace(args.trace_dir)
            if args.trace_dir
            else contextlib.nullcontext()
        )
        with ctx:
            for _ in range(max(args.steps, 2)):
                with timer:
                    run_once()
        bsz = cfg.data.batch_size
        result = {
            "mode": args.mode,
            "steps": max(args.steps, 2) - 1,
            "mean_step_ms": round(timer.mean * 1000, 2),
            "p50_step_ms": round(timer.p50 * 1000, 2),
            "images_per_sec": round(bsz * timer.steps_per_sec(), 2),
            "trace_dir": args.trace_dir,
        }
        if args.trace_dir:
            from zs3_tpu.utils.profiling import summarize_trace

            # per-op device attribution by hlo_category (the raw
            # xplane/Perfetto artifacts stay in trace_dir for deep dives)
            result["device_attribution_per_step"] = summarize_trace(
                args.trace_dir, steps=max(args.steps, 2)
            )
    elif args.command == "convert-weights":
        import jax

        from zs3_tpu.models.deeplab import build_deeplab
        from zs3_tpu.train.state import create_seg_state
        from zs3_tpu.utils.torch_convert import load_pretrained_backbone

        model = build_deeplab(cfg.model)
        state = create_seg_state(
            model, cfg, jax.random.key(cfg.train.seed),
            (1, cfg.data.crop_size, cfg.data.crop_size, 3), total_steps=1,
        )
        variables = load_pretrained_backbone(
            {"params": state.params, "batch_stats": state.batch_stats},
            args.pth, cfg.model.backbone,
        )
        state = state.replace(
            params=variables["params"], batch_stats=variables["batch_stats"]
        )
        import orbax.checkpoint as ocp

        ckpt_path = args.output
        ckpt = ocp.StandardCheckpointer()
        # orbax refuses to overwrite: write into an empty target only.
        if os.path.isdir(ckpt_path) and not os.listdir(ckpt_path):
            os.rmdir(ckpt_path)
        elif os.path.exists(ckpt_path):
            if not args.force:
                raise SystemExit(
                    f"convert-weights: output {ckpt_path!r} already exists; "
                    f"pass --force to replace it"
                )
            import shutil

            shutil.rmtree(ckpt_path)
        ckpt.save(ckpt_path, jax.device_get(state))
        ckpt.wait_until_finished()
        result = {"checkpoint": ckpt_path,
                  "usage": "pass via --resume with --ft for pretrained init"}
    elif args.command == "prepare-context":
        from zs3_tpu.data.context_prepare import prepare_context

        result = prepare_context(
            args.json, cfg.data.root, overwrite=args.overwrite
        )
    elif args.command == "build-embeddings":
        from zs3_tpu.data.classes import CONTEXT_CLASSES, VOC_CLASSES
        from zs3_tpu.data.embedding_build import build_embedding_registry

        names = (
            CONTEXT_CLASSES if cfg.data.dataset == "context" else VOC_CLASSES
        )
        aliases = {}
        for spec in args.alias:
            key, _, val = spec.partition("=")
            if not val:
                raise SystemExit(
                    f"--alias expects NAME=TOKENS, got {spec!r}"
                )
            aliases[key.lower()] = val
        result = build_embedding_registry(
            names,
            args.vectors,
            args.output,
            normalize=not args.no_normalize,
            aliases=aliases,
        )
    elif args.command == "export":
        from zs3_tpu.export import export_predictor, save_exported

        calib = None
        if args.int8:
            if not args.calib_images:
                raise SystemExit("export --int8 requires --calib-images")
            import numpy as np
            from PIL import Image as PILImage

            calib = [
                np.asarray(PILImage.open(p).convert("RGB"))
                for p in args.calib_images
            ]
        blob, manifest = export_predictor(
            cfg,
            batch_size=args.export_batch,
            emit=args.emit,
            platforms=args.platforms.split(",") if args.platforms else None,
            allow_random=args.allow_random,
            int8_calib_images=calib,
        )
        save_exported(args.output, blob, manifest)
        result = {"artifact": args.output, "bytes": len(blob), **manifest}
    else:  # pragma: no cover
        raise AssertionError(args.command)

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
