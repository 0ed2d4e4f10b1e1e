"""Pascal-Context preparation: detail-API JSON + COCO RLE -> label PNGs."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from zs3_tpu.data.classes import CONTEXT_CLASSES
from zs3_tpu.data.context_prepare import (
    decode_rle_string,
    encode_rle_string,
    prepare_context,
    rle_to_mask,
)


def test_rle_string_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        n = int(rng.integers(1, 12))
        counts = rng.integers(0, 3000, n).tolist()
        assert decode_rle_string(encode_rle_string(counts)) == counts


def test_rle_string_known_values():
    # Hand-derived from the pycocotools codec: value 3 -> one group,
    # char '3'+48; value 37 = 0b100101 -> groups [0b00101|0x20, 0b1]
    assert decode_rle_string(chr(3 + 48)) == [3]
    assert decode_rle_string(chr(0x25 + 48) + chr(1 + 48)) == [37]
    # delta coding kicks in from the 4th count on (i > 2)
    assert decode_rle_string(encode_rle_string([2, 3, 4, 5, 6])) == [2, 3, 4, 5, 6]


def test_rle_to_mask_column_major():
    # 2x3 mask, runs fill columns first: [0]*2 -> (0,0),(1,0) false;
    # [3] -> (0,1),(1,1),(0,2) true; [1] -> (1,2) false.
    mask = rle_to_mask({"counts": [2, 3, 1], "size": [2, 3]}, 2, 3)
    np.testing.assert_array_equal(
        mask, [[False, True, True], [False, True, False]]
    )
    with pytest.raises(ValueError):
        rle_to_mask({"counts": [2, 2], "size": [2, 3]}, 2, 3)


def test_rle_to_mask_rejects_polygon_segmentation():
    # COCO-style JSON also allows polygon form (list of coordinate
    # lists); we don't rasterize those — require a clear error, not an
    # AttributeError deep in the codec.
    with pytest.raises(ValueError, match="polygon segmentations"):
        rle_to_mask([[0.0, 0.0, 4.0, 0.0, 4.0, 4.0]], 4, 4)


def _square_rle(h, w, y0, y1, x0, x1):
    """Compressed RLE string for a filled [y0:y1, x0:x1] rectangle."""
    mask = np.zeros((h, w), np.bool_)
    mask[y0:y1, x0:x1] = True
    flat = mask.T.reshape(-1)  # column-major
    counts, val, run = [], False, 0
    for v in flat:
        if bool(v) == val:
            run += 1
        else:
            counts.append(run)
            val = bool(v)
            run = 1
    counts.append(run)
    return {"counts": encode_rle_string(counts), "size": [h, w]}, mask


def test_prepare_context_end_to_end(tmp_path):
    root = str(tmp_path)
    img_dir = os.path.join(root, "VOC2010", "JPEGImages")
    os.makedirs(img_dir)
    h, w = 10, 12
    cow = CONTEXT_CLASSES.index("cow")
    sky = CONTEXT_CLASSES.index("sky")
    seg_a, mask_a = _square_rle(h, w, 1, 4, 2, 6)    # cow
    seg_b, mask_b = _square_rle(h, w, 5, 9, 0, 12)   # sky
    seg_c, mask_c = _square_rle(h, w, 0, 1, 0, 2)    # rare category -> ignore
    data = {
        "images": [
            {"image_id": 7, "file_name": "2008_000001.jpg",
             "height": h, "width": w, "phase": "train"},
            {"image_id": 8, "file_name": "2008_000002.jpg",
             "height": h, "width": w, "phase": "val"},
            {"image_id": 9, "file_name": "2008_000003.jpg",
             "height": h, "width": w, "phase": "train"},  # no segments
        ],
        "categories": [
            {"category_id": 100, "name": "cow"},
            {"category_id": 200, "name": "sky"},
            {"category_id": 300, "name": "ashtray"},  # not in the 59
        ],
        "annos_segmentation": [
            {"image_id": 7, "category_id": 100, "segmentation": seg_a},
            {"image_id": 7, "category_id": 300, "segmentation": seg_c},
            {"image_id": 8, "category_id": 200, "segmentation": seg_b},
        ],
    }
    for image in data["images"]:
        Image.new("RGB", (w, h)).save(
            os.path.join(img_dir, image["file_name"])
        )
    json_path = str(tmp_path / "trainval_merged.json")
    with open(json_path, "w") as f:
        json.dump(data, f)

    with pytest.warns(UserWarning, match="no category in the JSON"):
        stats = prepare_context(json_path, root)
    assert stats == {
        "images": 2, "skipped": 1, "train": 1, "val": 1,
        # only cow + sky of the 59 appear in this fabricated JSON
        "matched_classes": 2, "unmatched_classes": 57,
    }

    lbl = np.asarray(Image.open(
        tmp_path / "VOC2010" / "SegmentationClassContext" / "2008_000001.png"
    ))
    assert lbl.shape == (h, w)
    np.testing.assert_array_equal(lbl[mask_a], cow)
    np.testing.assert_array_equal(lbl[mask_c], 255)  # rare class ignored
    np.testing.assert_array_equal(lbl[~(mask_a | mask_c)], 255)

    # The produced tree loads through the real reader.
    from zs3_tpu.data.context import ContextSegmentation

    train = ContextSegmentation(root, "train")
    val = ContextSegmentation(root, "val")
    assert train.names == ["2008_000001"] and val.names == ["2008_000002"]
    sample = val[0]
    np.testing.assert_array_equal(sample["label"][mask_b], sky)

    # Unseen filtering works on the prepared labels too.
    filtered = ContextSegmentation(root, "train", (cow,), filter_unseen=True)
    assert filtered.names == []


def test_prepare_context_cli(tmp_path, capsys):
    from zs3_tpu.cli import main

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "VOC2010", "JPEGImages"))
    seg, _ = _square_rle(4, 4, 0, 2, 0, 2)
    data = {
        "images": [{"image_id": 1, "file_name": "a.jpg", "height": 4,
                    "width": 4, "phase": "train"}],
        "categories": [{"category_id": 1, "name": "cat"}],
        "annos_segmentation": [
            {"image_id": 1, "category_id": 1, "segmentation": seg}
        ],
    }
    json_path = str(tmp_path / "tv.json")
    with open(json_path, "w") as f:
        json.dump(data, f)
    rc = main(["prepare-context", json_path, "--data-root", root])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["images"] == 1 and out["train"] == 1
