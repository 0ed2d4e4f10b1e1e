"""ZS3Net pipeline tests: classifier splice, fused step, trainer smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zs3_tpu.core.config import (
    Config,
    DataConfig,
    GMMNConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from zs3_tpu.models.deeplab import DeepLab
from zs3_tpu.train.gmmn import (
    GMMNTrainer,
    classifier_training_set,
    extract_classifier,
    generic_context_fallback,
    mmd_training_masks,
    splice_classifier,
)


@pytest.fixture()
def zs3_cfg(tmp_path):
    return Config(
        model=ModelConfig(
            backbone="resnet50", num_classes=6, compute_dtype="float32",
            dropout=False,
        ),
        gmmn=GMMNConfig(
            embed_dim=32, noise_dim=16, hidden_dim=32, feature_dim=256,
            pixels_per_class=32,
        ),
        data=DataConfig(
            dataset="synthetic", crop_size=65, base_size=65,
            batch_size=8, eval_batch_size=8, unseen_classes=(2, 4),
        ),
        optim=OptimConfig(gmmn_lr=1e-3, classifier_lr=1e-2),
        train=TrainConfig(
            epochs=1, steps_per_epoch=2,
            checkpoint_dir=str(tmp_path / "run"), keep_checkpoints=1,
        ),
    )


def test_splice_extract_roundtrip():
    m = DeepLab(backbone="resnet50", num_classes=5, dropout=False)
    variables = m.init(jax.random.key(0), jnp.zeros((1, 33, 33, 3)))
    cls = extract_classifier(variables)
    assert cls["kernel"].shape == (256, 5)
    new_cls = {"kernel": cls["kernel"] + 1.0, "bias": cls["bias"] - 1.0}
    spliced = splice_classifier(variables, new_cls)
    out = extract_classifier(spliced)
    np.testing.assert_allclose(np.asarray(out["kernel"]), np.asarray(new_cls["kernel"]))
    # splice actually changes the network output
    x = jnp.ones((1, 33, 33, 3))
    a = m.apply(variables, x)
    b = m.apply(spliced, x)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_classifier_training_set_routing():
    """ZS3 substitutes generated features on unseen rows; ZS5 keeps real
    features at pseudo-labeled unseen pixels and only fills empty slots
    with generated ones (the ADVICE-flagged self-training signal)."""
    C, P, D = 4, 3, 2
    real = jnp.arange(C * P * D, dtype=jnp.float32).reshape(C, P, D)
    fake = -jnp.ones((C, P, D), jnp.float32)
    real_mask = jnp.array(
        [[1, 1, 0], [1, 0, 0], [1, 1, 1], [1, 0, 0]], jnp.float32
    )
    unseen = jnp.array([0.0, 0.0, 1.0, 1.0])
    # ZS3 mode: unseen rows fully generated
    feats, mask = classifier_training_set(real, real_mask, fake, unseen, False)
    assert np.all(np.asarray(feats[2]) == -1) and np.all(np.asarray(feats[3]) == -1)
    np.testing.assert_array_equal(np.asarray(feats[0]), np.asarray(real[0]))
    np.testing.assert_array_equal(np.asarray(mask[0]), np.asarray(real_mask[0]))
    assert np.all(np.asarray(mask[2]) == 1)
    # ZS5 mode: real unseen features win where sampled
    feats, mask = classifier_training_set(real, real_mask, fake, unseen, True)
    np.testing.assert_array_equal(np.asarray(feats[2]), np.asarray(real[2]))
    np.testing.assert_array_equal(np.asarray(feats[3][0]), np.asarray(real[3][0]))
    assert np.all(np.asarray(feats[3][1:]) == -1)  # empty slots generated
    np.testing.assert_array_equal(np.asarray(feats[0]), np.asarray(real[0]))
    assert np.all(np.asarray(mask[2]) == 1) and np.all(np.asarray(mask[3]) == 1)


def test_mmd_training_masks_routing():
    """ZS3 restricts the generator's MMD to seen classes; ZS5 lets
    pseudo-labeled unseen pixels serve as MMD targets."""
    real_mask = jnp.array([[1, 1, 0], [1, 0, 0]], jnp.float32)
    seen_f = jnp.array([1.0, 0.0])  # class 1 unseen
    fm, rm = mmd_training_masks(real_mask, seen_f, False)
    assert np.all(np.asarray(fm[1]) == 0) and np.all(np.asarray(rm[1]) == 0)
    np.testing.assert_array_equal(np.asarray(rm[0]), np.asarray(real_mask[0]))
    fm, rm = mmd_training_masks(real_mask, seen_f, True)
    assert np.all(np.asarray(fm) == 1)
    np.testing.assert_array_equal(np.asarray(rm), np.asarray(real_mask))


def test_gmmn_trainer_end_to_end(zs3_cfg):
    t = GMMNTrainer(zs3_cfg)
    stats = t.train_epoch(0)
    assert np.isfinite(stats["mmd"]) and stats["mmd"] > 0
    assert np.isfinite(stats["cls_ce"])
    report = t.validate(0)
    assert "harmonic_miou" in report
    # generator and classifier actually stepped
    assert int(jax.device_get(t.gen_state.step)) == 2
    assert int(jax.device_get(t.cls_state.step)) == 2


@pytest.mark.slow
def test_gmmn_training_moves_generator_toward_real(zs3_cfg):
    """MMD should decrease over a few epochs of generator training."""
    import dataclasses

    cfg = zs3_cfg.replace(
        train=dataclasses.replace(
            zs3_cfg.train, epochs=1, steps_per_epoch=8, eval_interval=100
        )
    )
    t = GMMNTrainer(cfg)
    first = None
    mmds = []
    for i, batch in zip(range(8), t.train_loader):
        t.gen_state, t.cls_state, out = t.step_fn(
            t.gen_state, t.cls_state, t.trunk_variables, t.embeddings,
            t._device_batch(batch), t.rng,
        )
        mmds.append(float(out["mmd"]))
    assert mmds[-1] < mmds[0], f"MMD did not decrease: {mmds}"


def test_generic_context_fallback():
    """Classes absent from the batch (empty adjacency rows) must receive
    the batch's generic context — the top-total-adjacency-mass classes —
    instead of an all-masked (zero-vector) context the generator never
    trains on; present classes keep their own neighbor lists."""
    from zs3_tpu.ops.sampling import neighbor_lists_from_adjacency

    # 4 classes; class 2 absent (row/col zero). 0-1 touch a lot, 1-3 some.
    adj = jnp.asarray(
        [
            [0.0, 10.0, 0.0, 0.0],
            [10.0, 0.0, 0.0, 4.0],
            [0.0, 0.0, 0.0, 0.0],
            [0.0, 4.0, 0.0, 0.0],
        ]
    )
    nb, nbm = neighbor_lists_from_adjacency(adj, 2)
    assert float(nbm[2].sum()) == 0.0  # empty before the fallback
    nb2, nbm2 = generic_context_fallback(nb, nbm, adj)
    # present classes untouched
    np.testing.assert_array_equal(np.asarray(nb2[0]), np.asarray(nb[0]))
    np.testing.assert_array_equal(np.asarray(nbm2[1]), np.asarray(nbm[1]))
    # absent class gets the generic context: top mass = classes 1 (14), 0 (10)
    np.testing.assert_array_equal(np.asarray(nb2[2]), [1, 0])
    np.testing.assert_array_equal(np.asarray(nbm2[2]), [1.0, 1.0])


def test_graph_generator_uses_context():
    """Structural conditioning guard (fast; backs the acceptance-level
    ordering test): the graph generator's output must actually depend on
    the neighbor context it is conditioned on.  A regression that
    nullifies conditioning (zeroed gather, dropped mask, dead context
    branch) makes these outputs identical and fails here without
    training anything."""
    from zs3_tpu.models.gmmn import GraphContextGMMN

    gen = GraphContextGMMN(
        noise_dim=8, embed_dim=8, hidden_dim=32, feature_dim=16,
        context_dim=16,
    )
    emb = jnp.ones((2, 8))
    noise = jnp.zeros((2, 8))
    k = 4
    rng = np.random.default_rng(0)
    nb_a = jnp.asarray(rng.standard_normal((2, k, 8)), jnp.float32)
    nb_b = jnp.asarray(rng.standard_normal((2, k, 8)), jnp.float32)
    mask = jnp.ones((2, k))
    variables = gen.init(jax.random.key(0), emb, noise, nb_a, mask)
    out_a = gen.apply(variables, emb, noise, nb_a, mask)
    out_b = gen.apply(variables, emb, noise, nb_b, mask)
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b)), (
        "neighbor embeddings do not influence generation"
    )
    # the neighbor mask must gate the context too
    out_masked = gen.apply(variables, emb, noise, nb_a, jnp.zeros((2, k)))
    assert not np.allclose(np.asarray(out_a), np.asarray(out_masked)), (
        "neighbor mask does not gate the context"
    )


@pytest.mark.slow
def test_graph_context_trainer_smoke(zs3_cfg):
    import dataclasses

    cfg = zs3_cfg.replace(
        gmmn=dataclasses.replace(
            zs3_cfg.gmmn, graph_context=True, max_graph_neighbors=4
        )
    )
    t = GMMNTrainer(cfg)
    stats = t.train_epoch(0)
    assert np.isfinite(stats["mmd"])
    report = t.validate(0)
    assert "harmonic_miou" in report


@pytest.mark.slow
def test_gmmn_trainer_pallas_backend(zs3_cfg):
    """The Pallas MMD path must train identically-shaped to the jnp path
    (interpret mode on CPU) and produce a finite, positive MMD."""
    import dataclasses

    cfg = zs3_cfg.replace(
        gmmn=dataclasses.replace(zs3_cfg.gmmn, mmd_backend="pallas")
    )
    t = GMMNTrainer(cfg)
    stats = t.train_epoch(0)
    assert np.isfinite(stats["mmd"]) and stats["mmd"] > 0
    assert np.isfinite(stats["cls_ce"])


@pytest.mark.slow
def test_gmmn_resume_roundtrip(zs3_cfg):
    """GMMN checkpoints resume generator+classifier states exactly."""
    import dataclasses

    from zs3_tpu.utils.saver import Saver

    t = GMMNTrainer(zs3_cfg)
    t.train_epoch(0)
    t.validate(0)
    ckpt = Saver.latest_checkpoint(t.saver.directory)
    cfg2 = zs3_cfg.replace(
        train=dataclasses.replace(zs3_cfg.train, gmmn_resume=ckpt)
    )
    t2 = GMMNTrainer(cfg2)
    assert int(jax.device_get(t2.gen_state.step)) == 2
    a = jax.tree.leaves(jax.device_get(t.cls_state.params))[0]
    b = jax.tree.leaves(jax.device_get(t2.cls_state.params))[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_gmmn_int8_features_step(zs3_cfg):
    """--int8-features: the fused GMMN step extracts frozen-trunk
    features with s8 x s8 convs (i8 operands visible in the lowered
    program; absent without the flag) and still trains to finite
    losses.  Calibration is shared with int8_eval."""
    import dataclasses

    cfg = zs3_cfg.replace(
        train=dataclasses.replace(zs3_cfg.train, int8_features=True)
    )
    t = GMMNTrainer(cfg)
    assert t._int8_scales, "trunk calibration should run at construction"

    batch = t._device_batch(next(iter(t.train_loader)))
    lower_args = (
        t.gen_state, t.cls_state, t.trunk_variables, t.embeddings,
        batch, t.rng,
    )
    assert "xi8>" in t.step_fn.lower(*lower_args).as_text()

    t_float = GMMNTrainer(zs3_cfg)
    assert "xi8>" not in t_float.step_fn.lower(*lower_args).as_text()

    stats = t.train_epoch(0)
    assert np.isfinite(stats["mmd"]) and np.isfinite(stats["cls_ce"])

    # train/eval consistency: with int8_features the classifier was
    # retrained against int8-computed features, so validation runs
    # quantized too (no int8_eval flag needed)
    from zs3_tpu import quant

    with t._int8_eval_ctx():
        assert quant.scale_for(next(iter(t._int8_scales))) is not None
    report = t.validate(0)
    assert "harmonic_miou" in report
