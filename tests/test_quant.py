"""int8 PTQ inference (zs3_tpu.quant).

The reference has no quantization (fp32 torch throughout); this is the
TPU-native deployment extension: s8 x s8 -> s32 convs on the MXU
(~1.4x measured end-to-end images/sec at 513^2 on v5e, DESIGN.md §4).
These tests pin (a) the quant math against a transparent numpy
reference, (b) the calibration/exclusion contract, (c) trace-time
context semantics, and (d) the Predictor/export surfaces end-to-end
with argmax-agreement bars.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zs3_tpu import quant
from zs3_tpu.core.config import Config, DataConfig, ModelConfig
from zs3_tpu.models.deeplab import DeepLab


def _tiny_model(num_classes=4):
    cfg = Config(
        model=ModelConfig(
            backbone="resnet50", num_classes=num_classes,
            compute_dtype="float32", dropout=False,
        ),
        data=DataConfig(dataset="synthetic", crop_size=33),
    )
    model = DeepLab(
        backbone="resnet50", num_classes=num_classes, dropout=False,
        dtype=jnp.float32,
    )
    x = np.random.default_rng(0).standard_normal((2, 33, 33, 3)).astype(
        np.float32
    )
    variables = model.init(jax.random.key(0), jnp.asarray(x), train=False)
    return cfg, model, variables, x


def test_int8_conv_matches_numpy_reference():
    """Quant math: round/clip both operands, exact s32 accum, dequant."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32) * 3.0
    k = rng.standard_normal((3, 3, 4, 6)).astype(np.float32)
    absmax = 3.0

    got = np.asarray(
        quant.int8_conv(
            jnp.asarray(x), jnp.asarray(k), absmax,
            (1, 1), ((1, 1), (1, 1)), (1, 1), jnp.float32,
        )
    )

    s_act = absmax / 127.0
    s_w = np.maximum(np.abs(k).max(axis=(0, 1, 2)), 1e-8) / 127.0
    xq = np.clip(np.round(x / s_act), -127, 127).astype(np.int32)
    wq = np.clip(np.round(k / s_w), -127, 127).astype(np.int32)
    xp = np.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ref = np.zeros((1, 8, 8, 6), np.int64)
    for dy in range(3):
        for dx in range(3):
            patch = xp[:, dy : dy + 8, dx : dx + 8, :]
            ref += np.einsum("bhwc,co->bhwo", patch, wq[dy, dx], dtype=np.int64)
    ref = ref.astype(np.float32) * (s_act * s_w)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_quantized_context_is_trace_scoped():
    """scale_for answers only inside quantized(); values saturate to
    +-127 so an activation beyond the calibrated absmax clips."""
    assert quant.scale_for(("a", "conv")) is None
    with quant.quantized({"a/conv": 5.0, ("b", "conv"): 2.0}):
        assert quant.scale_for(("a", "conv")) == 5.0
        assert quant.scale_for(("b", "conv")) == 2.0
        assert quant.scale_for(("c", "conv")) is None
    assert quant.scale_for(("a", "conv")) is None

    # saturation: an input at 2x the calibrated absmax dequantizes to
    # ~absmax, not 2x
    x = jnp.full((1, 4, 4, 1), 10.0)
    k = jnp.ones((1, 1, 1, 1))
    y = quant.int8_conv(x, k, 5.0, (1, 1), ((0, 0), (0, 0)), (1, 1), jnp.float32)
    np.testing.assert_allclose(np.asarray(y), 5.0, rtol=0.02)


def test_calibrate_excludes_classifier_and_covers_convs():
    _, model, variables, x = _tiny_model()
    scales = quant.calibrate(
        model.apply, variables, [x], apply_kwargs={"train": False}
    )
    assert len(scales) > 50  # resnet50 trunk + aspp + decoder convs
    assert all(v > 0 for v in scales.values())
    assert not any("classifier" in p for p in scales)
    # every scale keys a real conv kernel in the param tree
    from flax import traverse_util

    params = traverse_util.flatten_dict(variables["params"])
    for path in scales:
        assert tuple(path) + ("kernel",) in params

    # round-trip through the JSON sidecar format
    back = quant.scales_from_json(quant.scales_to_json(scales))
    assert back == scales


def test_default_conv_scales_matches_calibrate_eligibility():
    """The synthetic-scales helper (bench.py / __graft_entry__.py /
    bench_train.py all route through it — VERDICT r3 #8) must select
    EXACTLY the convs real calibration selects: same exclude substrings,
    same lane-starvation floor.  Also works on eval_shape structs, the
    zero-weight path bench.py uses."""
    _, model, variables, x = _tiny_model()
    calibrated = quant.calibrate(
        model.apply, variables, [x], apply_kwargs={"train": False}
    )
    synthetic = quant.default_conv_scales(variables["params"])
    assert set(synthetic) == set(calibrated)
    assert all(v == 6.0 for v in synthetic.values())
    assert not any("classifier" in "/".join(p) for p in synthetic)

    shapes = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, 33, 33, 3)),
                           train=False)
    )
    from_shapes = quant.default_conv_scales(shapes["params"])
    assert set(from_shapes) == set(synthetic)


def test_percentile_calibration_clips_outliers():
    """percentile=P calibrates each conv to the P-th percentile of
    |input|: every scale is <= the absmax scale, outlier-carrying convs
    get strictly smaller scales, and the quantized forward still runs."""
    _, model, variables, x = _tiny_model()
    kwargs = dict(apply_kwargs={"train": False})
    absmax = quant.calibrate(model.apply, variables, [x], **kwargs)
    p99 = quant.calibrate(
        model.apply, variables, [x], percentile=99.0, **kwargs
    )
    assert set(p99) == set(absmax)
    assert all(p99[k] <= absmax[k] + 1e-6 for k in absmax)
    # real activation tensors have tails; at P=99 a solid majority of
    # convs must calibrate strictly below their max
    frac_smaller = np.mean(
        [p99[k] < absmax[k] * 0.999 for k in absmax]
    )
    assert frac_smaller > 0.5, f"only {frac_smaller:.0%} clipped"
    with quant.quantized(p99):
        q = jax.jit(lambda v, a: model.apply(v, a, train=False))(
            variables, jnp.asarray(x)
        )
    assert bool(jnp.all(jnp.isfinite(q)))


def test_quantized_forward_close_to_float():
    _, model, variables, x = _tiny_model()
    float_logits = model.apply(variables, jnp.asarray(x), train=False)
    scales = quant.calibrate(
        model.apply, variables, [x], apply_kwargs={"train": False}
    )
    with quant.quantized(scales):
        q_logits = jax.jit(
            lambda v, a: model.apply(v, a, train=False)
        )(variables, jnp.asarray(x))
    agree = float(
        jnp.mean(jnp.argmax(q_logits, -1) == jnp.argmax(float_logits, -1))
    )
    # random-init weights are the adversarial case (near-uniform logits);
    # measured agreement there is ~0.98
    assert agree > 0.9, f"argmax agreement {agree}"
    rel = float(
        jnp.abs(q_logits - float_logits).max() / jnp.abs(float_logits).max()
    )
    assert rel < 0.25, f"relative error {rel}"


@pytest.mark.slow
@pytest.mark.parametrize("backbone", ["mobilenet", "drn", "xception"])
def test_quantize_other_backbones(backbone):
    """Calibration + quantized forward across backbone families:
    depthwise (MobileNetV2) and grouped separable (Xception) convs
    stay float via the feature_group_count guard; the surrounding
    pointwise/dense convs quantize."""
    model = DeepLab(
        backbone=backbone, num_classes=4, dropout=False, dtype=jnp.float32
    )
    x = np.random.default_rng(5).standard_normal((1, 33, 33, 3)).astype(
        np.float32
    )
    variables = model.init(jax.random.key(0), jnp.asarray(x), train=False)
    scales = quant.calibrate(
        model.apply, variables, [x], apply_kwargs={"train": False}
    )
    assert len(scales) > 10, f"{backbone}: only {len(scales)} convs calibrated"
    float_logits = model.apply(variables, jnp.asarray(x), train=False)
    with quant.quantized(scales):
        q_logits = jax.jit(
            lambda v, a: model.apply(v, a, train=False)
        )(variables, jnp.asarray(x))
    agree = float(
        jnp.mean(jnp.argmax(q_logits, -1) == jnp.argmax(float_logits, -1))
    )
    assert agree > 0.85, f"{backbone}: argmax agreement {agree}"


@pytest.mark.slow
def test_predictor_int8_surface():
    """Predictor.quantize switches the jit to int8 and predictions stay
    close to the float predictor's on the same image."""
    from zs3_tpu.train.predict import Predictor

    cfg, _, _, _ = _tiny_model()
    rng = np.random.default_rng(3)
    image = rng.integers(0, 255, (40, 60, 3)).astype(np.uint8)

    p_float = Predictor(cfg)
    ref = p_float.predict_array(image)

    p_int8 = Predictor(cfg)
    n = p_int8.quantize([image])
    assert n > 50
    got = p_int8.predict_array(image)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    agree = float(np.mean(got == ref))
    assert agree > 0.8, f"prediction agreement {agree}"


@pytest.mark.slow
def test_int8_eval_close_to_float(tmp_path):
    """evaluate --int8: same state, quantized vs float validation —
    the reported metrics must agree closely (measured argmax agreement
    ~0.98 even on random-init weights)."""
    import dataclasses

    from zs3_tpu.core.config import TrainConfig
    from zs3_tpu.train.seen import SeenTrainer

    cfg = Config(
        model=ModelConfig(
            backbone="resnet50", num_classes=4, compute_dtype="float32",
            dropout=False,
        ),
        data=DataConfig(
            dataset="synthetic", crop_size=49, base_size=49,
            batch_size=8, eval_batch_size=8,
        ),
        train=TrainConfig(
            epochs=0, checkpoint_dir=str(tmp_path / "f"), seed=7
        ),
    )
    r_float = SeenTrainer(cfg).validate(epoch=0)

    cfg_q = cfg.replace(
        train=dataclasses.replace(
            cfg.train, int8_eval=True, checkpoint_dir=str(tmp_path / "q")
        )
    )
    trainer_q = SeenTrainer(cfg_q)
    r_int8 = trainer_q.validate(epoch=0)
    assert trainer_q._int8_scales, "int8_eval must calibrate scales"
    assert abs(r_int8["miou"] - r_float["miou"]) < 0.05
    assert abs(r_int8["pixel_accuracy"] - r_float["pixel_accuracy"]) < 0.05


@pytest.mark.slow
def test_export_int8_roundtrip(tmp_path):
    """export --int8 bakes quantized convs into a standalone artifact."""
    from zs3_tpu.export import export_predictor, load_exported, save_exported

    cfg, _, _, _ = _tiny_model()
    rng = np.random.default_rng(4)
    calib = [rng.integers(0, 255, (33, 33, 3)).astype(np.uint8)]
    blob, manifest = export_predictor(
        cfg, allow_random=True, int8_calib_images=calib,
        platforms=("cpu",),
    )
    assert manifest["int8"] is True
    path = str(tmp_path / "model_int8.shlo")
    save_exported(path, blob, manifest)
    run = load_exported(path)
    out = run(rng.integers(0, 255, (1, 33, 33, 3)).astype(np.uint8))
    assert out.shape == (1, 33, 33) and out.dtype == np.int32
    # the serialized module must actually contain int8 convolutions
    assert b"i8" in blob


def test_filter_excluded_substring_semantics():
    """exclude entries are substrings of the joined 'a/b/c' path, not
    exact segment matches (regression: a head module named anything but
    'classifier' must still be excludable)."""
    scales = {
        ("decoder", "classifier", "conv"): 1.0,
        ("decoder", "cls_head", "conv"): 2.0,
        ("backbone", "layer1", "conv"): 3.0,
    }
    assert quant.filter_excluded(scales, ("classifier",)) == {
        ("decoder", "cls_head", "conv"): 2.0,
        ("backbone", "layer1", "conv"): 3.0,
    }
    # substring spanning segments and partial-segment matches both work
    assert quant.filter_excluded(scales, ("cls",)) == {
        ("decoder", "classifier", "conv"): 1.0,
        ("backbone", "layer1", "conv"): 3.0,
    }
    assert quant.filter_excluded(scales, ("decoder/cls",)) == {
        ("decoder", "classifier", "conv"): 1.0,
        ("backbone", "layer1", "conv"): 3.0,
    }


def test_lane_starved_conv_stays_float():
    """Convs with < MIN_QUANT_IN_CH input channels (the drn/mobilenet/
    xception stems route through the Conv wrapper) are never calibrated
    and never lowered to int8, even under hand-written scales."""
    from zs3_tpu.models.layers import Conv

    rng = np.random.default_rng(7)
    x3 = jnp.asarray(rng.standard_normal((1, 9, 9, 3)), jnp.float32)
    x16 = jnp.asarray(rng.standard_normal((1, 9, 9, 16)), jnp.float32)
    conv3 = Conv(features=8, kernel_size=3, padding=1)
    conv16 = Conv(features=8, kernel_size=3, padding=1)
    v3 = conv3.init(jax.random.key(0), x3)
    v16 = conv16.init(jax.random.key(0), x16)

    # calibration records the 16-ch conv, skips the 3-ch one
    assert quant.calibrate(conv3.apply, v3, [np.asarray(x3)]) == {}
    s16 = quant.calibrate(conv16.apply, v16, [np.asarray(x16)])
    assert list(s16) == [("conv",)]

    # lowering: hand-written scales quantize the 16-ch conv (output
    # moves) but are ignored by the lane-starved one (bitwise float)
    y3_float = conv3.apply(v3, x3)
    y16_float = conv16.apply(v16, x16)
    with quant.quantized({("conv",): 3.0}):
        y3_q = jax.jit(conv3.apply)(v3, x3)
        y16_q = jax.jit(conv16.apply)(v16, x16)
    assert np.array_equal(np.asarray(y3_q), np.asarray(y3_float))
    assert not np.array_equal(np.asarray(y16_q), np.asarray(y16_float))
    assert np.allclose(y16_q, y16_float, atol=0.2)


def test_path_excluded():
    assert quant.path_excluded(("decoder", "classifier", "conv"))
    assert quant.path_excluded(("x",), exclude=("x",))
    assert not quant.path_excluded(("decoder", "refine", "conv"))


def test_fake_quant_grid_and_ste():
    """QAT operands land on the int8 grid and gradients pass straight
    through both roundings (exact ones)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 8)).astype(np.float32) * 2.0)
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 4)).astype(np.float32))
    x_fq, w_fq = quant.fake_quant_conv_operands(x, k)

    s_act = float(jnp.max(jnp.abs(x))) / 127.0
    ratio_x = np.asarray(x_fq) / s_act
    np.testing.assert_allclose(ratio_x, np.round(ratio_x), atol=1e-3)
    s_w = np.maximum(np.abs(np.asarray(k)).max(axis=(0, 1, 2)), 1e-8) / 127.0
    ratio_w = np.asarray(w_fq) / s_w
    np.testing.assert_allclose(ratio_w, np.round(ratio_w), atol=1e-3)
    # fake-quant is a sub-half-step perturbation (dynamic absmax: no
    # saturation, rounding only)
    assert float(jnp.max(jnp.abs(x_fq - x))) <= s_act * 0.5 + 1e-6

    gx = jax.grad(lambda a: jnp.sum(quant.fake_quant_conv_operands(a, k)[0]))(x)
    gk = jax.grad(lambda b: jnp.sum(quant.fake_quant_conv_operands(x, b)[1]))(k)
    np.testing.assert_allclose(np.asarray(gx), 1.0)
    np.testing.assert_allclose(np.asarray(gk), 1.0)


def test_fake_quant_conv_matches_deployed_int8_conv():
    """Given the same activation absmax, a float conv on fake-quantized
    operands computes the same integer-grid products int8_conv does —
    QAT trains on the deployment grid, not an approximation of it."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 16, 8)).astype(np.float32))
    absmax = float(jnp.max(jnp.abs(x)))

    x_fq, w_fq = quant.fake_quant_conv_operands(x, k, absmax)
    y_fq = jax.lax.conv_general_dilated(
        x_fq, w_fq, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y_int8 = quant.int8_conv(
        x, k, absmax, (1, 1), ((1, 1), (1, 1)), (1, 1), jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(y_fq), np.asarray(y_int8), rtol=1e-3, atol=1e-3
    )


@pytest.mark.slow
def test_qat_train_step_fake_quantizes_and_trains(tmp_path):
    """TrainConfig.qat=True: the compiled train step carries the
    fake-quant roundings (absent from the float step) and still trains
    to a finite loss with moving parameters.  Slow tier: lowering two
    resnet50 train steps to text costs ~100 s on the 1-core driver box;
    test_qat_tiny_model_quick pins the same contract cheaply."""
    from zs3_tpu.core.config import TrainConfig
    from zs3_tpu.train.seen import SeenTrainer, make_train_step

    cfg = Config(
        model=ModelConfig(
            backbone="resnet50", num_classes=4,
            compute_dtype="float32", dropout=False,
        ),
        data=DataConfig(
            dataset="synthetic", crop_size=33, base_size=33,
            batch_size=8, eval_batch_size=8,
        ),
        train=TrainConfig(
            epochs=1, steps_per_epoch=2, checkpoint_dir=str(tmp_path),
            qat=True, eval_interval=10**9,
        ),
    )
    trainer = SeenTrainer(cfg)
    batch = trainer._device_batch(next(iter(trainer.train_loader)))

    txt_qat = trainer.train_step.lower(
        trainer.state, batch, trainer.rng
    ).as_text()
    float_step = make_train_step(trainer.loss_fn, donate=False)
    txt_float = float_step.lower(trainer.state, batch, trainer.rng).as_text()
    n_qat = txt_qat.count("round_nearest_even")
    n_float = txt_float.count("round_nearest_even")
    # two roundings per eligible conv, though JAX dedups identical-shape
    # lowerings into shared funcs (61 convs -> 37 textual rounds here);
    # the float step has none at all
    assert n_float == 0 and n_qat > 20, (n_qat, n_float)

    params_before = jax.device_get(trainer.state.params)
    stats = trainer.train_epoch(0)
    assert np.isfinite(stats["train_loss"])
    moved = jax.tree.map(
        lambda a, b: not np.array_equal(a, jax.device_get(b)),
        params_before, trainer.state.params,
    )
    assert any(jax.tree.leaves(moved))


def test_qat_tiny_model_quick(tmp_path):
    """Quick-tier QAT contract on a 2-conv toy model: make_train_step's
    qat=True trace-time switch makes every eligible conv emit fake-quant
    roundings (the float step has none), and the step still trains to a
    finite loss with moving params.  Same mechanism the resnet50
    SeenTrainer integration test (slow tier) exercises at full scale."""
    import flax.linen as nn

    from zs3_tpu.models.layers import Conv
    from zs3_tpu.train.seen import make_train_step
    from zs3_tpu.train.state import create_seg_state

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, x, train=False, deterministic=True):
            x = nn.relu(Conv(16, kernel_size=3, padding=1, name="c1")(x))
            return Conv(4, kernel_size=1, name="head")(x)

    cfg = Config(
        model=ModelConfig(backbone="resnet50", num_classes=4,
                          compute_dtype="float32", dropout=False),
        data=DataConfig(dataset="synthetic", crop_size=9, base_size=9,
                        batch_size=2, eval_batch_size=2),
    )
    # input channels = MIN_QUANT_IN_CH so both convs are PTQ/QAT-eligible
    state = create_seg_state(
        Toy(), cfg, jax.random.key(0), (2, 9, 9, quant.MIN_QUANT_IN_CH),
        total_steps=4,
    )

    def loss_fn(logits, labels):
        return jnp.mean((logits - jax.nn.one_hot(labels, 4)) ** 2)

    batch = {
        "image": jnp.asarray(
            np.random.default_rng(0).normal(
                size=(2, 9, 9, quant.MIN_QUANT_IN_CH)
            ).astype(np.float32)
        ),
        "label": jnp.asarray(
            np.random.default_rng(1).integers(0, 4, (2, 9, 9)), jnp.int32
        ),
    }
    rng = jax.random.key(1)

    qat_step = make_train_step(loss_fn, donate=False, qat=True)
    float_step = make_train_step(loss_fn, donate=False)
    n_qat = qat_step.lower(state, batch, rng).as_text().count(
        "round_nearest_even"
    )
    n_float = float_step.lower(state, batch, rng).as_text().count(
        "round_nearest_even"
    )
    # two roundings (input + kernel) per eligible conv, two convs
    assert n_float == 0 and n_qat >= 4, (n_qat, n_float)

    new_state, stats = qat_step(state, batch, rng)
    assert np.isfinite(float(stats["loss"]))
    moved = jax.tree.map(
        lambda a, b: not np.array_equal(np.asarray(a), np.asarray(b)),
        state.params, new_state.params,
    )
    assert any(jax.tree.leaves(moved))
