"""Gradient accumulation (TrainConfig.grad_accum).

The jit train step lax.scan's over microbatches: optimizer sees the
mean gradient of the full batch, BN stats chain per microbatch (torch
accumulation semantics).  The scan implementation is validated against
a transparent Python-loop reference built from the same micro-step
pieces, so a regression in the scan plumbing (carry threading, grad
averaging, rng fan-out) fails numerically, not just structurally.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zs3_tpu.core.config import Config, DataConfig, ModelConfig
from zs3_tpu.core.mesh import replicate, shard_batch
from zs3_tpu.models.deeplab import DeepLab
from zs3_tpu.train.seen import make_train_step
from zs3_tpu.train.state import create_seg_state
from zs3_tpu.utils.losses import build_seg_loss


def _tiny_state_and_batch(batch=8):
    cfg = Config(
        model=ModelConfig(
            backbone="resnet50", num_classes=3, compute_dtype="float32",
            dropout=False,
        ),
        data=DataConfig(dataset="synthetic", crop_size=33),
    )
    model = DeepLab(
        backbone="resnet50", num_classes=3, dropout=False, dtype=jnp.float32
    )
    state = create_seg_state(
        model, cfg, jax.random.key(0), (1, 33, 33, 3), total_steps=10
    )
    rng = np.random.default_rng(0)
    images = rng.standard_normal((batch, 33, 33, 3)).astype(np.float32)
    labels = rng.integers(0, 3, (batch, 33, 33)).astype(np.int32)
    return state, {"image": images, "label": labels}


@pytest.mark.slow
def test_scan_matches_python_loop_reference():
    """accum=2 scan == mean-of-micro-grads with chained BN stats."""
    state, batch = _tiny_state_and_batch(batch=8)
    loss_fn = build_seg_loss("ce")
    rng = jax.random.key(1)

    # Transparent reference: per-micro value_and_grad, chained stats.
    step_rng = jax.random.fold_in(rng, state.step)
    micro_rngs = jax.random.split(step_rng, 2)

    def micro(params, stats, images, labels, drop_rng):
        variables = {"params": params, "batch_stats": stats}
        logits, updates = state.apply_fn(
            variables, images, train=True, deterministic=False,
            rngs={"dropout": drop_rng}, mutable=["batch_stats"],
        )
        return loss_fn(logits, labels), updates["batch_stats"]

    # jit the reference's per-micro grad too: eager-mode conv gradients
    # on XLA:CPU differ from compiled ones by ~2% (different backward
    # conv algorithm), which would swamp the plumbing comparison.
    grad_fn = jax.jit(jax.value_and_grad(micro, has_aux=True))
    images = jnp.asarray(batch["image"])
    labels = jnp.asarray(batch["label"])
    stats = state.batch_stats
    grad_sum, losses = None, []
    for i in range(2):
        (loss_i, stats), g = grad_fn(
            state.params, stats, images[i * 4:(i + 1) * 4],
            labels[i * 4:(i + 1) * 4], micro_rngs[i],
        )
        losses.append(loss_i)
        grad_sum = g if grad_sum is None else jax.tree.map(
            jnp.add, grad_sum, g
        )
    grads = jax.tree.map(lambda g: g / 2.0, grad_sum)
    ref_state = state.apply_gradients(grads=grads).replace(batch_stats=stats)
    ref_loss = (losses[0] + losses[1]) / 2.0

    # Scan implementation under test.
    step = make_train_step(loss_fn, donate=False, grad_accum=2)
    new_state, out = step(state, jax.tree.map(jnp.asarray, batch), rng)

    # Tolerances absorb float32 reduction-order noise between the scan
    # and the unrolled loop (measured ~2e-6 on the loss, ~2e-5 on params
    # after the optimizer).  A plumbing bug — missing /accum, broken
    # stats chaining, rng reuse — produces errors orders of magnitude
    # beyond these bars.
    np.testing.assert_allclose(float(out["loss"]), float(ref_loss), rtol=1e-5)
    for a, b in zip(
        jax.tree.leaves(new_state.params), jax.tree.leaves(ref_state.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    for a, b in zip(
        jax.tree.leaves(new_state.batch_stats),
        jax.tree.leaves(ref_state.batch_stats),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    assert int(new_state.step) == int(ref_state.step) == 1


def test_indivisible_batch_raises():
    state, batch = _tiny_state_and_batch(batch=6)
    step = make_train_step(build_seg_loss("ce"), donate=False, grad_accum=4)
    with pytest.raises(ValueError, match="not divisible by grad_accum"):
        step(state, jax.tree.map(jnp.asarray, batch), jax.random.key(1))
    with pytest.raises(ValueError, match="grad_accum must be >= 1"):
        make_train_step(build_seg_loss("ce"), grad_accum=0)


@pytest.mark.slow
def test_accumulated_step_runs_sharded(mesh8):
    """accum=2 over an 8-device data mesh: micro dim stays sharded."""
    state, batch = _tiny_state_and_batch(batch=16)
    state = replicate(state, mesh8)
    dev_batch = shard_batch(batch, mesh8)
    step = make_train_step(
        build_seg_loss("ce"), donate=False, grad_accum=2, mesh=mesh8
    )
    new_state, out = step(state, dev_batch, jax.random.key(1))
    assert np.isfinite(float(out["loss"]))
    assert int(new_state.step) == 1


@pytest.mark.slow
def test_qat_composes_with_grad_accum():
    """--qat inside --grad-accum: the fake-quant roundings live inside
    micro_loss, so they must appear in the scanned step's lowering and
    the step must still train to a finite loss.  (A regression that
    entered the qat() context outside the scan body would silently
    train float microbatches.)"""
    state, batch = _tiny_state_and_batch(batch=8)
    step = make_train_step(
        build_seg_loss("ce"), donate=False, grad_accum=2, qat=True
    )
    txt = step.lower(state, batch, jax.random.key(1)).as_text()
    assert txt.count("round_nearest_even") > 20

    new_state, out = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(out["loss"]))
    assert int(new_state.step) == 1
