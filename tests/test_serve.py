"""Inference server + auto-resume + profile command."""

import http.client
import io
import json

import numpy as np
import pytest
from PIL import Image

from zs3_tpu.core.config import Config, DataConfig, ModelConfig, TrainConfig


@pytest.fixture(scope="module")
def server():
    from zs3_tpu.serve import InferenceServer

    cfg = Config(
        model=ModelConfig(
            backbone="resnet50", num_classes=5, compute_dtype="float32",
            dropout=False,
        ),
        data=DataConfig(dataset="synthetic", crop_size=33, base_size=33),
    )
    srv = InferenceServer(cfg, port=0).start(warmup=True)
    yield srv
    srv.stop()


def _conn(server):
    return http.client.HTTPConnection("127.0.0.1", server.port, timeout=60)


def test_healthz_and_info(server):
    c = _conn(server)
    c.request("GET", "/healthz")
    r = c.getresponse()
    assert r.status == 200
    assert json.loads(r.read())["warm"] is True
    c.request("GET", "/info")
    info = json.loads(c.getresponse().read())
    assert info["num_classes"] == 5 and info["crop_size"] == 33


def test_predict_roundtrip(server, rng):
    img = Image.fromarray(
        rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)
    )
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    c = _conn(server)
    c.request("POST", "/predict", body=buf.getvalue())
    r = c.getresponse()
    assert r.status == 200
    assert r.getheader("Content-Type") == "image/png"
    pred = np.asarray(Image.open(io.BytesIO(r.read())))
    assert pred.shape == (40, 50)
    assert pred.max() < 5
    # colorized + sliding variants
    c.request("POST", "/predict?color=1&sliding=1", body=buf.getvalue())
    r = c.getresponse()
    color = np.asarray(Image.open(io.BytesIO(r.read())))
    assert color.shape == (40, 50, 3)


@pytest.mark.slow
def test_serve_exported_artifact(tmp_path, rng):
    """The server runs from an exported StableHLO artifact alone — no
    checkpoint, no model rebuild — and reports its self-described shape."""
    from zs3_tpu.export import export_predictor, save_exported
    from zs3_tpu.serve import InferenceServer

    cfg = Config(
        model=ModelConfig(
            backbone="resnet50", num_classes=4, compute_dtype="float32",
            dropout=False,
        ),
        data=DataConfig(dataset="synthetic", crop_size=33, base_size=33),
    )
    path = str(tmp_path / "m.shlo")
    save_exported(path, *export_predictor(cfg, batch_size=1, allow_random=True))
    srv = InferenceServer(Config(), port=0, artifact=path).start(warmup=True)
    try:
        c = _conn(srv)
        c.request("GET", "/info")
        info = json.loads(c.getresponse().read())
        assert info["source"] == "artifact"
        assert info["num_classes"] == 4 and info["crop_size"] == 33
        img = Image.fromarray(rng.integers(0, 255, (40, 50, 3), dtype=np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        c.request("POST", "/predict", body=buf.getvalue())
        r = c.getresponse()
        assert r.status == 200
        pred = np.asarray(Image.open(io.BytesIO(r.read())))
        assert pred.shape == (40, 50) and pred.max() < 4
        # sliding needs live logits: clean 400, not a crash
        c.request("POST", "/predict?sliding=1", body=buf.getvalue())
        assert c.getresponse().status == 400
    finally:
        srv.stop()


def test_micro_batched_serving(tmp_path, rng):
    """--serve-batch aggregates concurrent requests onto one batched jit
    forward: all responses correct, and at least one device call served
    multiple requests."""
    import concurrent.futures

    from zs3_tpu.serve import InferenceServer

    cfg = Config(
        model=ModelConfig(
            backbone="resnet50", num_classes=5, compute_dtype="float32",
            dropout=False,
        ),
        data=DataConfig(dataset="synthetic", crop_size=33, base_size=33),
    )
    srv = InferenceServer(cfg, port=0, serve_batch=4).start(warmup=True)
    try:
        bodies = []
        for i in range(8):
            img = Image.fromarray(
                rng.integers(0, 255, (30 + i, 40, 3), dtype=np.uint8)
            )
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            bodies.append((i, buf.getvalue()))

        def post(item):
            i, body = item
            c = _conn(srv)
            c.request("POST", "/predict", body=body)
            r = c.getresponse()
            assert r.status == 200
            return i, np.asarray(Image.open(io.BytesIO(r.read())))

        with concurrent.futures.ThreadPoolExecutor(8) as ex:
            results = list(ex.map(post, bodies))
        for i, pred in results:
            assert pred.shape == (30 + i, 40)
            assert pred.max() < 5
        sizes = srv.service.batcher.batch_sizes
        assert sum(sizes) == 9  # 8 requests + 1 warmup
        assert max(sizes) > 1, f"no request ever batched: {sizes}"
        c = _conn(srv)
        c.request("GET", "/info")
        info = json.loads(c.getresponse().read())
        assert info["serve_batch"] == 4
    finally:
        srv.stop()


def test_serve_batch_rejects_artifact(tmp_path):
    from zs3_tpu.export import export_predictor, save_exported
    from zs3_tpu.serve import InferenceServer

    cfg = Config(
        model=ModelConfig(
            backbone="resnet50", num_classes=4, compute_dtype="float32",
            dropout=False,
        ),
        data=DataConfig(dataset="synthetic", crop_size=33, base_size=33),
    )
    path = str(tmp_path / "m.shlo")
    save_exported(path, *export_predictor(cfg, batch_size=1, allow_random=True))
    with pytest.raises(ValueError, match="serve-batch"):
        InferenceServer(Config(), port=0, artifact=path, serve_batch=4)


def test_predict_bad_body(server):
    c = _conn(server)
    c.request("POST", "/predict", body=b"not an image")
    assert c.getresponse().status == 400
    c.request("POST", "/nope", body=b"x")
    assert c.getresponse().status == 404


@pytest.mark.slow
def test_cli_auto_resume_and_profile(tmp_path):
    """--auto-resume picks up the newest checkpoint; profile times steps."""
    from zs3_tpu.cli import main

    common = [
        "--dataset", "synthetic", "--crop-size", "33", "--batch-size", "8",
        "--backbone", "resnet50", "--compute-dtype", "float32",
        "--checkpoint-dir", str(tmp_path / "run"), "--epochs", "1",
        "--steps-per-epoch", "1",
    ]
    assert main(["train-seen"] + common) == 0
    # second run auto-resumes from the first's checkpoint
    assert main(["train-seen"] + common + ["--auto-resume"]) == 0
    from zs3_tpu.utils.saver import Saver

    exp = Saver.latest_experiment(str(tmp_path / "run"), "synthetic",
                                  "deeplab-resnet101")
    assert exp is not None
    # profile command produces finite timings, in every mode (fwd and
    # int8-fwd profile the inference path; int8-fwd must actually lower
    # s8 convs — it shares quant.default_conv_scales with bench.py)
    assert main(["profile"] + common + ["--steps", "2"]) == 0
    assert main(["profile"] + common + ["--steps", "2", "--mode", "fwd"]) == 0
    assert main(
        ["profile"] + common + ["--steps", "2", "--mode", "int8-fwd"]
    ) == 0
