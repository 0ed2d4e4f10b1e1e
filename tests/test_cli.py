"""CLI: config resolution, show-config, end-to-end synthetic run."""

import json

import pytest

from zs3_tpu.cli import build_config, main
from zs3_tpu.core.config import Config, voc_unseen_split


def _parse(argv):
    import argparse

    from zs3_tpu.cli import _add_common

    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="command")
    for name in ("train-seen", "show-config"):
        _add_common(sub.add_parser(name))
    return parser.parse_args(argv)


def test_flag_overrides():
    args = _parse(
        ["train-seen", "--dataset", "pascal", "--unseen-split", "4",
         "--lr", "0.123", "--backbone", "resnet50", "--epochs", "3"]
    )
    cfg = build_config(args)
    assert cfg.data.unseen_classes == voc_unseen_split(4)
    assert cfg.optim.lr == 0.123
    assert cfg.model.backbone == "resnet50"
    assert cfg.train.epochs == 3
    # untouched fields keep defaults
    assert cfg.optim.momentum == Config().optim.momentum


def test_config_file_then_flags(tmp_path):
    cfg0 = Config()
    import dataclasses

    cfg0 = dataclasses.replace(
        cfg0, optim=dataclasses.replace(cfg0.optim, lr=0.5, momentum=0.8)
    )
    path = tmp_path / "c.json"
    path.write_text(cfg0.to_json())
    args = _parse(["train-seen", "--config", str(path), "--lr", "0.9"])
    cfg = build_config(args)
    assert cfg.optim.lr == 0.9  # flag wins
    assert cfg.optim.momentum == 0.8  # file wins over default


def test_show_config(capsys):
    assert main(["show-config"]) == 0
    out = capsys.readouterr().out
    assert json.loads(out)["model"]["backbone"] == "resnet101"


@pytest.mark.slow
def test_cli_train_end_to_end(tmp_path, capsys):
    rc = main(
        ["train-seen", "--dataset", "synthetic", "--crop-size", "65",
         "--base-size", "65", "--batch-size", "8", "--epochs", "1",
         "--steps-per-epoch", "2", "--backbone", "resnet50",
         "--compute-dtype", "float32",
         "--checkpoint-dir", str(tmp_path / "run")]
    )
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "train_loss" in result and "miou" in result


def test_infer_command(tmp_path, capsys):
    import numpy as np
    from PIL import Image

    img = tmp_path / "scene.jpg"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (40, 50, 3), dtype=np.uint8)
    ).save(img)
    out = tmp_path / "preds"
    rc = main(
        ["infer", str(img), "--output", str(out), "--dataset", "synthetic",
         "--backbone", "resnet50", "--crop-size", "65", "--base-size", "65",
         "--compute-dtype", "float32"]
    )
    assert rc == 0
    raw = np.asarray(Image.open(out / "scene.png"))
    assert raw.shape == (40, 50)
    assert (out / "scene_color.png").exists()


@pytest.mark.slow
def test_infer_int8_command(tmp_path, capsys):
    """--int8 through the argparse surface: calibrates on the inputs,
    reports the quantized-conv count, writes the same artifacts."""
    import numpy as np
    from PIL import Image

    img = tmp_path / "scene.jpg"
    Image.fromarray(
        np.random.default_rng(1).integers(0, 255, (40, 50, 3), dtype=np.uint8)
    ).save(img)
    out = tmp_path / "preds"
    rc = main(
        ["infer", str(img), "--int8", "--int8-percentile", "99.5",
         "--output", str(out),
         "--dataset", "synthetic", "--backbone", "resnet50",
         "--crop-size", "65", "--base-size", "65",
         "--compute-dtype", "float32"]
    )
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["int8_convs"] > 50
    assert np.asarray(Image.open(out / "scene.png")).shape == (40, 50)


@pytest.mark.slow
def test_export_int8_requires_calib(tmp_path, capsys):
    import numpy as np
    from PIL import Image

    with pytest.raises(SystemExit):
        main(["export", "--int8", "--output", str(tmp_path / "q.shlo"),
              "--allow-random", "--dataset", "synthetic",
              "--backbone", "resnet50", "--crop-size", "65",
              "--compute-dtype", "float32"])

    cal = tmp_path / "cal.jpg"
    Image.fromarray(
        np.random.default_rng(2).integers(0, 255, (65, 65, 3), dtype=np.uint8)
    ).save(cal)
    rc = main(
        ["export", "--int8", "--calib-images", str(cal),
         "--output", str(tmp_path / "q.shlo"), "--allow-random",
         "--dataset", "synthetic", "--backbone", "resnet50",
         "--crop-size", "65", "--compute-dtype", "float32"]
    )
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["int8"] is True and result["bytes"] > 0


@pytest.mark.slow
def test_convert_weights_command(tmp_path, capsys):
    import sys

    import numpy as np
    import torch

    sys.path.insert(0, "tests")
    from tests.torch_oracle import ResNetAtrous as TorchResNet

    torch.manual_seed(0)
    tmodel = TorchResNet(layers=(2, 2, 2, 2))
    pth = tmp_path / "resnet.pth"
    torch.save(tmodel.state_dict(), pth)

    # converting against a mismatched-depth model must fail loudly;
    # build a matching torch resnet50 for the real path
    tmodel50 = TorchResNet(layers=(3, 4, 6, 3))
    pth50 = tmp_path / "resnet50.pth"
    torch.save(tmodel50.state_dict(), pth50)
    out = tmp_path / "ckpt"
    rc = main(
        ["convert-weights", str(pth50), "--output", str(out),
         "--backbone", "resnet50", "--dataset", "synthetic",
         "--crop-size", "65", "--base-size", "65",
         "--compute-dtype", "float32"]
    )
    assert rc == 0
    # resulting checkpoint restores into a fresh state with torch weights
    import jax

    from zs3_tpu.core.config import Config, DataConfig, ModelConfig
    from zs3_tpu.models.deeplab import build_deeplab
    from zs3_tpu.train.state import create_seg_state
    from zs3_tpu.utils.saver import Saver

    cfg = Config(
        model=ModelConfig(backbone="resnet50", compute_dtype="float32"),
        data=DataConfig(dataset="synthetic", crop_size=65),
    )
    model = build_deeplab(cfg.model)
    target = create_seg_state(model, cfg, jax.random.key(0), (1, 65, 65, 3), 1)
    restored = Saver.restore(str(out), target)
    stem = np.asarray(restored.params["encoder"]["stem_conv"]["conv"]["kernel"])
    torch_stem = tmodel50.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(stem, torch_stem, rtol=1e-6)

    # Mismatched depth must fail loudly, not graft a wrong-shaped encoder
    # (the (2,2,2,2) pth has fewer blocks than resnet50's (3,4,6,3)).
    import pytest

    with pytest.raises(ValueError, match="mismatch"):
        main(
            ["convert-weights", str(pth), "--output", str(tmp_path / "bad"),
             "--backbone", "resnet50", "--dataset", "synthetic",
             "--crop-size", "65", "--base-size", "65",
             "--compute-dtype", "float32"]
        )
