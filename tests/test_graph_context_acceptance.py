"""Graph-context zero-shot acceptance (BASELINE config 5 analog).

The paper's spatial-context-prior variant (arXiv:1906.00817 §3.3)
conditions generation on neighboring regions' class embeddings.  The
synthetic `context_tint` mode makes that signal real — each region's
appearance depends on the classes it touches — so the graph-context
pipeline is testable end-to-end without Pascal-Context on disk.

Measured reference (fixed seed, this config; TPU re-verified round 3):
plain GMMN unseen mIoU 0.236 / harmonic 0.271; graph-context 0.291 /
0.306.  Three failure modes this test guards: a broken graph
conditioning path, the unseen-class zero-context collapse that
train/gmmn.py::generic_context_fallback fixes (collapse measures ~0.03
unseen — far below the threshold here), and — via the plain-vs-graph
ORDERING assert (VERDICT r2 #2 / SURVEY §6) — a regression that
quietly nullifies conditioning (e.g. a broken adjacency gather), which
would leave the graph variant at plain-GMMN quality and previously
passed the absolute bars.

Regime guard (DESIGN §6 caveat a): the ordering only holds with enough
context signal and generator training — context_tint=0.35 and 90 GMMN
epochs here; at tint 0.25 / 45 epochs the plain generator still leads.
Both generators train on the SAME trunk and split, same seed.
"""

import dataclasses

import jax
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


@pytest.mark.slow
def test_graph_context_transfer_on_context_data(tmp_path):
    from zs3_tpu.train.gmmn import GMMNTrainer
    from zs3_tpu.train.seen import SeenTrainer

    cfg = Config(
        model=ModelConfig(
            backbone="resnet50", num_classes=10, compute_dtype="float32",
            dropout=False,
        ),
        gmmn=GMMNConfig(
            embed_dim=8, noise_dim=8, hidden_dim=128, pixels_per_class=64,
            max_graph_neighbors=4, graph_context=True,
        ),
        data=DataConfig(
            dataset="synthetic", crop_size=49, base_size=49,
            batch_size=8, eval_batch_size=8, unseen_classes=(3, 5),
            synthetic_classes=10, synthetic_items=32,
            synthetic_embed_dim=8, synthetic_tint_weight=1.0,
            synthetic_context_tint=0.35,
        ),
        optim=OptimConfig(lr=0.02, gmmn_lr=1e-3, classifier_lr=1e-2),
        train=TrainConfig(
            epochs=40, eval_interval=10**9,
            checkpoint_dir=str(tmp_path / "run"), keep_checkpoints=1,
        ),
    )

    seen = SeenTrainer(cfg)
    for e in range(cfg.train.epochs):
        seen.train_epoch(e)
    seen_report = seen.validate(cfg.train.epochs - 1)
    # Context-dependent appearance makes the supervised problem harder
    # than the context-free acceptance split; the trunk only needs to be
    # good enough to carry features (TPU reference: 0.27 seen mIoU).
    assert seen_report["seen_miou"] > 0.15, (
        f"supervised stage failed to learn: {seen_report}"
    )
    assert seen_report["unseen_miou"] < 0.02
    variables = jax.device_get(
        {"params": seen.state.params, "batch_stats": seen.state.batch_stats}
    )

    reports = {}
    for variant in ("graph", "plain"):
        gcfg = cfg.replace(
            train=dataclasses.replace(cfg.train, epochs=90),
            gmmn=dataclasses.replace(
                cfg.gmmn, graph_context=(variant == "graph")
            ),
        )
        t = GMMNTrainer(gcfg, seg_variables=variables)
        for e in range(gcfg.train.epochs):
            t.train_epoch(e)
        reports[variant] = t.validate(gcfg.train.epochs - 1)
    report = reports["graph"]

    # Graph-conditioned transfer: well above chance AND well above the
    # zero-context collapse (~0.03).  TPU reference: 0.291 unseen.
    assert report["unseen_miou"] > 0.12, (
        f"graph-context zero-shot transfer failed: {report}"
    )
    assert report["harmonic_miou"] > 0.15, (
        f"harmonic mIoU did not rise: {report}"
    )
    assert report["seen_miou"] > 0.15, (
        f"classifier retrain destroyed seen classes: {report}"
    )
    assert np.isfinite(report["miou"])

    # ORDERING (the paper's claim, SURVEY §6): with real context signal
    # (tint 0.35) and full training, graph conditioning must beat the
    # plain generator on unseen mIoU.  Measured gaps at this fixed
    # seed: TPU +0.054 (0.291 vs 0.236) — asserted with margin; CPU
    # +0.006 (0.243 vs 0.237) — the direction holds but sits within
    # numeric noise, so the CPU tier asserts non-inferiority only and
    # the strict ordering guard runs on the TPU tier
    # (ZS3_TEST_PLATFORM=tpu).  A nullified conditioning path (e.g. a
    # broken adjacency gather) lands at plain quality and fails the TPU
    # margin; it is also caught structurally by
    # test_zs3.py::test_graph_generator_uses_context.
    margin = 0.02 if jax.default_backend() == "tpu" else -0.01
    assert (
        report["unseen_miou"] > reports["plain"]["unseen_miou"] + margin
    ), (
        "graph-context conditioning is not helping: "
        f"graph={report} plain={reports['plain']}"
    )
