"""Secondary benchmarks: train-step, GMMN-step and eval throughput.

Not part of the driver contract (bench.py owns the headline metric);
this script documents the full performance envelope as one JSON line
per metric.  Same honest-timing rules as bench.py (distinct inputs,
forced round-trips; see DESIGN.md §5).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

# Persistent compile cache (see bench.py): warmup compiles, timed
# regions never do.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_compile_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _timed(dispatch, force, iters=8):
    force(dispatch(0))
    t0 = time.perf_counter()
    last = None
    for i in range(iters):
        last = dispatch(i + 1)
    force(last)
    return (time.perf_counter() - t0) / iters


def main():
    import numpy as np

    from zs3_tpu.core.config import Config, DataConfig, ModelConfig
    from zs3_tpu.models.deeplab import DeepLab
    from zs3_tpu.models.gmmn import build_gmmn
    from zs3_tpu.train.gmmn import (
        ClsState,
        GenState,
        extract_classifier,
        make_zs3_step,
    )
    from zs3_tpu.train.seen import make_eval_step, make_train_step
    from zs3_tpu.train.state import SegTrainState, create_seg_state
    from zs3_tpu.utils.losses import build_seg_loss
    import optax

    on_tpu = jax.devices()[0].platform != "cpu"
    size = 513 if on_tpu else 65
    bt = 16 if on_tpu else 4  # batch (train, eval, and zs3 steps)
    backbone = "resnet101" if on_tpu else "resnet50"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    cfg = Config(
        model=ModelConfig(
            backbone=backbone,
            compute_dtype="bfloat16" if on_tpu else "float32",
            dropout=False,
        ),
        data=DataConfig(dataset="synthetic", crop_size=size, batch_size=bt),
    )
    model = DeepLab(
        backbone=backbone, num_classes=21, dropout=False, dtype=dtype
    )
    state = create_seg_state(
        model, cfg, jax.random.key(0), (1, size, size, 3), total_steps=1000
    )
    img = jax.random.normal(jax.random.key(1), (bt, size, size, 3), jnp.float32)
    lbl = jax.random.randint(jax.random.key(2), (bt, size, size), 0, 21)
    results = {}

    # --- supervised train step
    train_step = make_train_step(build_seg_loss("ce"), donate=True)
    holder = {"state": state}

    def d_train(i):
        holder["state"], out = train_step(
            holder["state"], {"image": img, "label": lbl}, jax.random.key(3)
        )
        return out["loss"]

    dt = _timed(d_train, lambda r: float(r))
    results["train_images_per_sec"] = bt / dt
    # Train-step MFU (VERDICT r2 #5): XLA-counted step FLOPs over the
    # measured wall time, against the same sustained ceiling bench.py
    # measures (pass --probe-ceiling to re-measure it here; default uses
    # the recorded constant so this secondary bench stays fast).
    try:
        step_flops = (
            train_step.lower(
                holder["state"], {"image": img, "label": lbl}, jax.random.key(3)
            )
            .compile()
            .cost_analysis()["flops"]
        )
    except Exception:
        step_flops = float("nan")
    if step_flops == step_flops:
        import bench as _bench

        if "--probe-ceiling" in sys.argv and on_tpu:
            sustained, source = _bench.measure_sustained_ceiling()
        else:
            sustained, source = _bench.FALLBACK_SUSTAINED_TFS, "fallback"
        tfs = step_flops / dt / 1e12
        results_extra = {
            "train_step_tflops_per_sec": round(tfs, 1),
            "train_step_mfu_vs_sustained_ceiling": round(tfs / sustained, 4),
            "ceiling_source": source,
        }
    else:
        results_extra = {}

    # --- eval step (fused pallas upsample+argmax + on-device confusion)
    eval_step = make_eval_step(21)
    eval_state = holder["state"]
    # Distinct inputs per call, materialized BEFORE the timed region —
    # an eager `img + eps` inside the timed loop is its own dispatch
    # through the relay and can stall the pipeline (measured: it cost a
    # probe ~2x at B32).
    eval_imgs = [(img + 1e-4 * i).block_until_ready() for i in range(10)]

    def d_eval(i):
        return eval_step(eval_state, {"image": eval_imgs[i], "label": lbl})

    dt = _timed(d_eval, lambda r: float(jnp.sum(r)))
    results["eval_images_per_sec"] = bt / dt

    # --- fused ZS3 GMMN step
    gen = build_gmmn(cfg.gmmn)
    gv = gen.init(jax.random.key(4), jnp.zeros((1, 300)), jnp.zeros((1, 300)))
    gen_state = GenState.create(
        apply_fn=gen.apply, params=gv["params"], tx=optax.adam(1e-3)
    )
    cls_state = ClsState.create(
        apply_fn=None,
        params=extract_classifier(
            {"params": eval_state.params, "batch_stats": eval_state.batch_stats}
        ),
        tx=optax.adam(1e-2),
    )
    trunk = {"params": eval_state.params, "batch_stats": eval_state.batch_stats}
    emb = jnp.asarray(
        np.random.default_rng(0).standard_normal((21, 300)), jnp.float32
    )
    unseen = jnp.zeros((21,)).at[10].set(1.0).at[14].set(1.0)
    zs3_step = make_zs3_step(model, gen, cfg, 21, unseen, False, donate=True)
    zs3_holder = {"g": gen_state, "c": cls_state}

    def d_zs3(i):
        zs3_holder["g"], zs3_holder["c"], out = zs3_step(
            zs3_holder["g"], zs3_holder["c"], trunk, emb,
            {"image": img, "label": lbl}, jax.random.key(5),
        )
        return out["mmd"]

    dt = _timed(d_zs3, lambda r: float(r))
    results["zs3_step_images_per_sec"] = bt / dt

    # --- fused ZS3 step with --int8-features: the frozen-trunk forward
    # runs s8 x s8 on the MXU.  Scale VALUES don't affect throughput,
    # so default_conv_scales' constant absmax stands in for calibration
    # (one shared eligibility rule with bench.py / __graft_entry__.py).
    from zs3_tpu import quant

    scales = quant.default_conv_scales(eval_state.params)
    zs3_q_step = make_zs3_step(
        model, gen, cfg, 21, unseen, False, donate=True, int8_scales=scales
    )
    gv2 = gen.init(jax.random.key(6), jnp.zeros((1, 300)), jnp.zeros((1, 300)))
    zs3_q_holder = {
        "g": GenState.create(
            apply_fn=gen.apply, params=gv2["params"], tx=optax.adam(1e-3)
        ),
        # copy the LIVE post-timing cls params: the float step's donation
        # consumed the original extract_classifier buffers
        "c": ClsState.create(
            apply_fn=None,
            params=jax.tree.map(jnp.array, zs3_holder["c"].params),
            tx=optax.adam(1e-2),
        ),
    }

    def d_zs3_q(i):
        zs3_q_holder["g"], zs3_q_holder["c"], out = zs3_q_step(
            zs3_q_holder["g"], zs3_q_holder["c"], trunk, emb,
            {"image": img, "label": lbl}, jax.random.key(7),
        )
        return out["mmd"]

    dt = _timed(d_zs3_q, lambda r: float(r))
    results["zs3_step_int8_images_per_sec"] = bt / dt

    for name, value in results.items():
        line = {
            "metric": f"{name}_{backbone}_{size}",
            "value": round(value, 2),
            "unit": "images/sec",
        }
        if name == "train_images_per_sec":
            line.update(results_extra)
        print(json.dumps(line))


if __name__ == "__main__":
    main()
