"""StableHLO export: serialized artifacts reproduce the live model."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zs3_tpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
from zs3_tpu.export import (
    export_predictor,
    load_exported,
    make_inference_fn,
    save_exported,
)


def _cfg(tmp_path, **model_kw):
    return Config(
        model=ModelConfig(
            backbone="resnet50", num_classes=4, compute_dtype="float32",
            dropout=False, **model_kw,
        ),
        data=DataConfig(
            dataset="synthetic", crop_size=33, base_size=33,
            batch_size=2, eval_batch_size=2,
        ),
        train=TrainConfig(checkpoint_dir=str(tmp_path / "run")),
    )


@pytest.mark.slow
def test_export_roundtrip_matches_live_model(tmp_path):
    """serialize -> deserialize -> call must equal the in-process fn,
    with no zs3_tpu model code in the load path.  Slow tier: the
    serialize + deserialize + live-oracle chain costs ~60 s on the
    1-core driver box; the quick tier keeps the export surface's
    cheap contract tests."""
    cfg = _cfg(tmp_path)
    blob, manifest = export_predictor(cfg, batch_size=2, allow_random=True)
    path = str(tmp_path / "model.shlo")
    save_exported(path, blob, manifest)

    loaded = load_exported(path)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (2, 33, 33, 3), dtype=np.uint8)
    out = np.asarray(loaded(images))
    assert out.shape == (2, 33, 33) and out.dtype == np.int32
    assert set(np.unique(out)) <= set(range(4))

    # Oracle: rebuild the same inference fn live (same seed => same init).
    from zs3_tpu.models.deeplab import build_deeplab
    from zs3_tpu.train.state import create_seg_state

    model = build_deeplab(cfg.model)
    state = create_seg_state(
        model, cfg, jax.random.key(cfg.train.seed), (1, 33, 33, 3),
        total_steps=1,
    )
    infer = make_inference_fn(
        model, {"params": state.params, "batch_stats": state.batch_stats}
    )
    np.testing.assert_array_equal(out, np.asarray(infer(jnp.asarray(images))))

    with open(path + ".json") as f:
        m = json.load(f)
    assert m["num_classes"] == 4 and "cpu" in m["platforms"]


@pytest.mark.slow
def test_export_logits_emit(tmp_path):
    cfg = _cfg(tmp_path)
    blob, manifest = export_predictor(cfg, batch_size=1, emit="logits", allow_random=True)
    path = str(tmp_path / "logits.shlo")
    save_exported(path, blob, manifest)
    loaded = load_exported(path)
    images = np.zeros((1, 33, 33, 3), np.uint8)
    out = np.asarray(loaded(images))
    assert out.shape == (1, 33, 33, 4) and out.dtype == np.float32
    assert np.isfinite(out).all()


def test_export_rejects_bad_emit(tmp_path):
    cfg = _cfg(tmp_path)
    with pytest.raises(ValueError):
        export_predictor(cfg, emit="probabilities", allow_random=True)


def test_export_requires_checkpoint(tmp_path):
    """A forgotten --resume must fail loudly, not serialize random weights."""
    cfg = _cfg(tmp_path)
    with pytest.raises(ValueError, match="randomly"):
        export_predictor(cfg)


def _save_seen_checkpoint(cfg, path):
    """Seen-stage SegTrainState checkpoint (what train-seen writes)."""
    import orbax.checkpoint as ocp

    from zs3_tpu.models.deeplab import build_deeplab
    from zs3_tpu.train.state import create_seg_state

    model = build_deeplab(cfg.model)
    state = create_seg_state(
        model, cfg, jax.random.key(cfg.train.seed),
        (1, cfg.data.crop_size, cfg.data.crop_size, 3), total_steps=1,
    )
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, jax.device_get(state))
    ckpt.wait_until_finished()


def _save_gmmn_checkpoint(path, kernel, bias):
    """{"gen","cls"} payload shaped like GMMNTrainer.validate writes."""
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, {
        "gen": {"params": {"hidden0": {"kernel": np.zeros((4, 4), np.float32)}},
                "step": np.int32(1)},
        "cls": {"params": {"kernel": kernel, "bias": bias},
                "step": np.int32(1)},
    })
    ckpt.wait_until_finished()


@pytest.mark.slow
def test_export_splices_gmmn_classifier(tmp_path):
    """The zero-shot deliverable: export --resume <seen> --gmmn-resume
    <gmmn ckpt> must serve the retrained classifier, exactly as
    evaluate-gmmn splices it (VERDICT r2 / advisor export.py finding)."""
    cfg = _cfg(tmp_path)
    seen = str(tmp_path / "seen_ckpt")
    _save_seen_checkpoint(cfg, seen)
    # A classifier whose bias overwhelmingly favors class 2 makes the
    # splice observable: every exported label must be 2.
    kernel = np.zeros((256, 4), np.float32)
    bias = np.array([0.0, 0.0, 100.0, 0.0], np.float32)
    gmmn = str(tmp_path / "gmmn_ckpt")
    _save_gmmn_checkpoint(gmmn, kernel, bias)

    blob, manifest = export_predictor(
        cfg, checkpoint=seen, gmmn_checkpoint=gmmn, batch_size=1
    )
    assert manifest["zero_shot_classifier"] is True
    path = str(tmp_path / "zs.shlo")
    save_exported(path, blob, manifest)
    out = np.asarray(load_exported(path)(np.zeros((1, 33, 33, 3), np.uint8)))
    np.testing.assert_array_equal(out, 2)


@pytest.mark.slow
def test_export_rejects_gmmn_checkpoint_as_trunk(tmp_path):
    """Pointing --resume at a gen/cls payload must fail with directions,
    not an orbax structure-mismatch traceback."""
    cfg = _cfg(tmp_path)
    gmmn = str(tmp_path / "gmmn_ckpt")
    _save_gmmn_checkpoint(
        gmmn, np.zeros((256, 4), np.float32), np.zeros((4,), np.float32)
    )
    with pytest.raises(ValueError, match="gmmn-resume"):
        export_predictor(cfg, checkpoint=gmmn)


@pytest.mark.slow
def test_export_rejects_trunk_checkpoint_as_gmmn(tmp_path):
    """And the converse: --gmmn-resume at a seen-stage checkpoint."""
    cfg = _cfg(tmp_path)
    seen = str(tmp_path / "seen_ckpt")
    _save_seen_checkpoint(cfg, seen)
    with pytest.raises(ValueError, match="not a GMMN-stage"):
        export_predictor(cfg, checkpoint=seen, gmmn_checkpoint=seen)


@pytest.mark.slow
def test_export_cli(tmp_path, capsys):
    from zs3_tpu.cli import main

    out_path = str(tmp_path / "cli.shlo")
    rc = main([
        "export", "--output", out_path, "--dataset", "synthetic",
        "--crop-size", "33", "--base-size", "33", "--backbone", "resnet50",
        "--compute-dtype", "float32", "--export-batch", "1",
        "--checkpoint-dir", str(tmp_path / "run"), "--allow-random",
    ])
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["artifact"] == out_path
    loaded = load_exported(out_path)
    out = np.asarray(loaded(np.zeros((1, 33, 33, 3), np.uint8)))
    assert out.shape == (1, 33, 33)
