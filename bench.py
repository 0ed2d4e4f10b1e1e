"""Headline benchmark: DeepLabv3+ (ResNet-101) forward images/sec/chip @ 513².

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference never published throughput (BASELINE.json.published is
empty; the paper reports no img/s), so vs_baseline is reported against
this rebuild's own first honest measurement (DEFAULT_BASELINE below) —
it tracks optimization progress, not reference parity.  MFU is reported
against both the nominal peak and the chip's measured sustained ceiling
so the ratio can't masquerade as near-roofline (DESIGN.md §4).

Timing methodology (important under the axon TPU relay):
  * every timed call gets a *different* input (a scalar shift folded into
    the jit fn) — identical-input calls can be served from a result cache;
  * the jit fn returns a scalar reduction of the logits and the harness
    calls float() on it, forcing a full compute + value round-trip;
    block_until_ready() alone does not block through the relay.
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
    def forward(v, x, shift):
        # shift makes every timed call a distinct computation; the sum
        # forces materialization of the full logits.
        logits = model.apply(v, x + shift, train=False)
        return jnp.sum(logits.astype(jnp.float32))

    best = 0.0
    best_flops = float("nan")
    on_tpu = dev.platform != "cpu"
    batches = [32, 64, 128] if on_tpu else [1]
    n_iters = 10 if on_tpu else 2
    for batch in batches:
        x = jax.device_put(
            jax.random.normal(jax.random.key(1), (batch, size, size, 3), jnp.float32),
            dev,
        )
        try:
            float(forward(variables, x, 0.0))  # compile + warm
        except Exception:
            continue  # OOM at this batch; try smaller
        # Dispatch all iterations (each a distinct computation), then force
        # only the last: device execution is in-order, so its completion
        # implies all previous completed — pipelined but honest timing.
        t0 = time.perf_counter()
        results = [forward(variables, x, 1e-4 * (i + 1)) for i in range(n_iters)]
        float(results[-1])
        dt = time.perf_counter() - t0
        assert all(jnp.isfinite(float(r)) for r in results)
        ips = batch * n_iters / dt
        if ips > best:
            best = ips
            try:
                best_flops = (
                    forward.lower(variables, x, 0.0)
                    .compile()
                    .cost_analysis()["flops"]
                    / batch
                )
            except Exception:
                best_flops = float("nan")

    # First honest measurement of this rebuild (v5e, B32, serial forcing)
    # — the fixed denominator so vs_baseline tracks optimization progress.
    # (The reference published no throughput numbers; BASELINE.json's
    # target is empirical speed-of-light.)
    DEFAULT_BASELINE = 365.254
    vs = best / DEFAULT_BASELINE
    # MFU against the v5e NOMINAL bf16 peak (394 TF/s).  Context (see
    # DESIGN.md §4-5): the best *measured* sustained rate on this relay-
    # attached chip is ~184 TF/s for a pure 8192^3 bf16 matmul chain, so
    # nominal MFU understates how close the network is to the device's
    # real envelope; mfu_sustained reports against that measured ceiling.
    NOMINAL_TFS = 394.0
    SUSTAINED_TFS = 184.0
    tfs = best * best_flops / 1e12 if best_flops == best_flops else float("nan")
    print(
        json.dumps(
            {
                "metric": "deeplabv3plus_resnet101_fwd_513_images_per_sec_per_chip",
                "value": round(best, 3),
                "unit": "images/sec",
                "vs_baseline": round(vs, 4),
                "tflops_per_sec": round(tfs, 1) if tfs == tfs else None,
                "mfu_nominal": round(tfs / NOMINAL_TFS, 4) if tfs == tfs else None,
                "mfu_vs_sustained_ceiling": (
                    round(tfs / SUSTAINED_TFS, 4) if tfs == tfs else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
