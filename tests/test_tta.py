"""TTA (multi-scale + flip) evaluation and sliding-window inference."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from zs3_tpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
from zs3_tpu.metrics.tta import make_tta_eval_step, tta_probs
from zs3_tpu.models.deeplab import DeepLab


@pytest.fixture(scope="module")
def small_model():
    model = DeepLab(backbone="resnet50", num_classes=5, dropout=False)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 33, 33, 3)))
    return model, variables


def test_tta_single_scale_matches_plain_argmax(small_model, rng):
    """scales=(1.0,), flip=False must reproduce the plain eval path."""
    model, variables = small_model
    x = jnp.asarray(rng.standard_normal((2, 33, 33, 3)), jnp.float32)
    lab = jnp.asarray(rng.integers(0, 5, (2, 33, 33)), jnp.int32)
    fwd = lambda v, xx: model.apply(v, xx, train=False)
    step = make_tta_eval_step(fwd, 5, 255, scales=(1.0,), flip=False)
    conf = np.asarray(step(variables, {"image": x, "label": lab}))
    # plain reference
    from zs3_tpu.ops.confusion import confusion_matrix

    pred = jnp.argmax(fwd(variables, x), axis=-1).astype(jnp.int32)
    ref = np.asarray(confusion_matrix(lab, pred, 5, 255))
    np.testing.assert_array_equal(conf, ref)


def test_tta_flip_is_exact_for_mirrored_input(small_model, rng):
    """Mirroring the input mirrors the flip-TTA probabilities exactly
    (the ensemble {x, flip(x)} is mirror-symmetric)."""
    model, variables = small_model
    x = jnp.asarray(rng.standard_normal((1, 33, 33, 3)), jnp.float32)
    fwd = lambda v, xx: model.apply(v, xx, train=False)
    p = tta_probs(fwd, variables, x, scales=(1.0,), flip=True)
    p_mir = tta_probs(fwd, variables, x[:, :, ::-1, :], scales=(1.0,), flip=True)
    np.testing.assert_allclose(
        np.asarray(p), np.asarray(p_mir[:, :, ::-1, :]), atol=1e-5
    )


def test_tta_multiscale_runs_and_confusion_mass(small_model, rng):
    model, variables = small_model
    x = jnp.asarray(rng.standard_normal((2, 33, 33, 3)), jnp.float32)
    lab = jnp.asarray(rng.integers(0, 5, (2, 33, 33)), jnp.int32)
    fwd = lambda v, xx: model.apply(v, xx, train=False)
    step = make_tta_eval_step(fwd, 5, 255, scales=(0.75, 1.0, 1.25), flip=True)
    conf = np.asarray(step(variables, {"image": x, "label": lab}))
    assert conf.shape == (5, 5)
    assert conf.sum() == 2 * 33 * 33


@pytest.mark.slow
def test_trainer_tta_validate(tmp_path):
    """SeenTrainer.validate runs under ms+flip TTA config."""
    from zs3_tpu.train.seen import SeenTrainer

    cfg = Config(
        model=ModelConfig(
            backbone="resnet50", num_classes=6, compute_dtype="float32",
            dropout=False,
        ),
        data=DataConfig(
            dataset="synthetic", crop_size=33, base_size=33,
            batch_size=8, eval_batch_size=8, synthetic_classes=6,
        ),
        train=TrainConfig(
            epochs=1, steps_per_epoch=1, checkpoint_dir=str(tmp_path / "run"),
            keep_checkpoints=1, eval_scales=(0.75, 1.0), eval_flip=True,
        ),
    )
    t = SeenTrainer(cfg)
    report = t.validate(0)
    assert 0.0 <= report["miou"] <= 1.0


@pytest.mark.slow
def test_predict_sliding(tmp_path, rng):
    """Sliding-window inference covers odd sizes, small images, and
    agrees with the direct forward on an exactly-crop-sized image."""
    from zs3_tpu.train.predict import Predictor

    cfg = Config(
        model=ModelConfig(
            backbone="resnet50", num_classes=5, compute_dtype="float32",
            dropout=False,
        ),
        data=DataConfig(dataset="synthetic", crop_size=33, base_size=33),
        train=TrainConfig(checkpoint_dir=str(tmp_path / "run")),
    )
    p = Predictor(cfg)
    # larger than crop, odd dims
    img = rng.integers(0, 255, (50, 71, 3), dtype=np.uint8)
    pred = p.predict_sliding(img)
    assert pred.shape == (50, 71)
    assert pred.min() >= 0 and pred.max() < 5
    # smaller than crop
    small = rng.integers(0, 255, (21, 17, 3), dtype=np.uint8)
    pred_s = p.predict_sliding(small)
    assert pred_s.shape == (21, 17)
    # exactly crop-sized: sliding == plain argmax of the forward
    exact = rng.integers(0, 255, (33, 33, 3), dtype=np.uint8)
    pred_e = p.predict_sliding(exact)
    from zs3_tpu.data.transforms import normalize

    norm = normalize({"image": exact, "label": np.zeros((33, 33), np.uint8)})
    direct = np.asarray(
        jnp.argmax(
            p.model.apply(p.variables, jnp.asarray(norm["image"])[None],
                          train=False),
            axis=-1,
        )
    )[0]
    np.testing.assert_array_equal(pred_e, direct)
