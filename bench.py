"""Headline benchmark: DeepLabv3+ (ResNet-101) forward images/sec/chip @ 513².

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference never published throughput (BASELINE.json.published is
empty; the paper reports no img/s), so vs_baseline is reported against a
recorded best-so-far in BENCH_HISTORY if present, else 1.0.  The model
runs in bf16 compute / f32 params, jit-compiled, batch swept for best
throughput, with block_until_ready fencing for honest numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def main():
    from zs3_tpu.models.deeplab import DeepLab

    model = DeepLab(
        backbone="resnet101",
        output_stride=16,
        num_classes=21,
        dropout=False,
        dtype=jnp.bfloat16,
    )
    size = 513
    dev = jax.devices()[0]
    rng = jax.random.key(0)
    init_x = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(rng, init_x))()
    variables = jax.device_put(variables, dev)

    @jax.jit
    def forward(v, x):
        return model.apply(v, x, train=False)

    best = 0.0
    batches = [8, 16, 32] if dev.platform != "cpu" else [1]
    for batch in batches:
        x = jax.device_put(
            jax.random.normal(jax.random.key(1), (batch, size, size, 3), jnp.float32),
            dev,
        )
        try:
            out = forward(variables, x)
            out.block_until_ready()
        except Exception:
            continue  # OOM at this batch; try smaller
        # Warmup done by compile; timed runs:
        n_iters = 10 if dev.platform != "cpu" else 2
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = forward(variables, x)
        out.block_until_ready()
        dt = time.perf_counter() - t0
        ips = batch * n_iters / dt
        best = max(best, ips)

    hist_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_HISTORY")
    prev = None
    if os.path.exists(hist_path):
        try:
            prev = float(open(hist_path).read().strip())
        except ValueError:
            prev = None
    vs = best / prev if prev else 1.0
    try:
        with open(hist_path, "w") as f:
            f.write(f"{max(best, prev or 0.0):.4f}\n")
    except OSError:
        pass
    print(
        json.dumps(
            {
                "metric": "deeplabv3plus_resnet101_fwd_513_images_per_sec_per_chip",
                "value": round(best, 3),
                "unit": "images/sec",
                "vs_baseline": round(vs, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
