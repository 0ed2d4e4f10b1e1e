"""build-embeddings: word-vector files -> ordered registry .npy."""

import json
import struct

import numpy as np
import pytest

from zs3_tpu.data.classes import VOC_CLASSES
from zs3_tpu.data.embedding_build import (
    build_embedding_registry,
    read_word_vectors,
)
from zs3_tpu.data.embeddings import load_class_embeddings

# tokens the VOC registry resolves through (incl. alias/compound parts)
VOC_TOKENS = [
    "background", "airplane", "bicycle", "bird", "boat", "bottle", "bus",
    "car", "cat", "chair", "cow", "dining", "table", "dog", "horse",
    "motorcycle", "person", "potted", "plant", "sheep", "sofa", "train",
    "tv", "monitor",
]


def _token_vec(token, dim=10):
    rng = np.random.default_rng(abs(hash(token)) % 2**32)
    return rng.standard_normal(dim).astype(np.float32)


@pytest.fixture()
def w2v_text(tmp_path):
    path = tmp_path / "vecs.vec"
    with open(path, "w") as f:
        f.write(f"{len(VOC_TOKENS)} 10\n")
        for t in VOC_TOKENS:
            f.write(t + " " + " ".join(f"{v:.6f}" for v in _token_vec(t)) + "\n")
    return str(path)


@pytest.fixture()
def w2v_binary(tmp_path):
    path = tmp_path / "vecs.bin"
    with open(path, "wb") as f:
        f.write(f"{len(VOC_TOKENS)} 10\n".encode())
        for t in VOC_TOKENS:
            f.write(t.encode() + b" ")
            f.write(struct.pack("<10f", *_token_vec(t)))
            f.write(b"\n")
    return str(path)


def test_read_text_and_binary_agree(w2v_text, w2v_binary):
    text, dt = read_word_vectors(w2v_text, VOC_TOKENS)
    binary, db = read_word_vectors(w2v_binary, VOC_TOKENS)
    assert dt == db == 10
    assert set(text) == set(binary) == set(VOC_TOKENS)
    for t in VOC_TOKENS:
        np.testing.assert_allclose(text[t], binary[t], atol=1e-5)


def test_headerless_glove_text(tmp_path):
    path = tmp_path / "glove.txt"
    with open(path, "w") as f:
        for t in ("cat", "dog"):
            f.write(t + " " + " ".join(map(str, _token_vec(t, 4))) + "\n")
    table, dim = read_word_vectors(str(path), ["cat", "dog"])
    assert dim == 4 and set(table) == {"cat", "dog"}


def test_build_registry_voc(w2v_binary, tmp_path):
    """Full VOC build: aliases and compound names resolve, rows land in
    class order, output loads through the normal registry path."""
    out = str(tmp_path / "emb.npy")
    report = build_embedding_registry(VOC_CLASSES, [w2v_binary], out)
    assert report["classes"] == 21 and report["dim"] == 10
    via = report["files"][0]["resolved_via"]
    assert via["aeroplane"] == "airplane"
    assert via["pottedplant"] == "potted+plant"
    emb = np.load(out)
    assert emb.shape == (21, 10)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)
    # row order matches the class list: check a couple directly
    cow = _token_vec("cow")
    np.testing.assert_allclose(
        emb[VOC_CLASSES.index("cow")], cow / np.linalg.norm(cow), atol=1e-5
    )
    tv = (_token_vec("tv") + _token_vec("monitor")) / 2
    np.testing.assert_allclose(
        emb[VOC_CLASSES.index("tvmonitor")], tv / np.linalg.norm(tv), atol=1e-5
    )
    # and the normal loader accepts the artifact
    loaded = load_class_embeddings(VOC_CLASSES, out)
    assert loaded.shape == (21, 10)


def test_fastnvec_concat(w2v_text, w2v_binary, tmp_path):
    out = str(tmp_path / "concat.npy")
    report = build_embedding_registry(
        VOC_CLASSES, [w2v_text, w2v_binary], out, normalize=False
    )
    assert report["dim"] == 20
    emb = np.load(out)
    np.testing.assert_allclose(emb[:, :10], emb[:, 10:], atol=1e-5)


def test_missing_class_raises(tmp_path):
    path = tmp_path / "tiny.vec"
    with open(path, "w") as f:
        f.write("1 4\ncat 1 2 3 4\n")
    with pytest.raises(ValueError, match="no vector for classes"):
        build_embedding_registry(["cat", "zebra"], [str(path)], str(tmp_path / "o.npy"))


def test_user_alias(tmp_path):
    path = tmp_path / "tiny.vec"
    with open(path, "w") as f:
        f.write("2 4\ncat 1 2 3 4\nkuh 5 6 7 8\n")
    out = str(tmp_path / "o.npy")
    build_embedding_registry(
        ["cat", "cow"], [str(path)], out, normalize=False,
        aliases={"cow": "kuh"},
    )
    np.testing.assert_allclose(np.load(out)[1], [5, 6, 7, 8])


def test_cli_build_embeddings(w2v_binary, tmp_path, capsys):
    from zs3_tpu.cli import main

    out = str(tmp_path / "cli_emb.npy")
    rc = main(["build-embeddings", w2v_binary, "--output", out,
               "--dataset", "pascal"])
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["classes"] == 21
    assert np.load(out).shape == (21, 10)
