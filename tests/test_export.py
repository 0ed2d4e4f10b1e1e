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


def test_export_roundtrip_matches_live_model(tmp_path):
    """serialize -> deserialize -> call must equal the in-process fn,
    with no zs3_tpu model code in the load path."""
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
