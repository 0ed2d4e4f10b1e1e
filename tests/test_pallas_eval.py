"""Fused upsample+argmax kernel vs the resize->argmax oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from zs3_tpu.ops.pallas_eval import predict_labels, upsample_argmax
from zs3_tpu.ops.resize import resize_bilinear


def _oracle(logits, size, align_corners=True):
    up = resize_bilinear(jnp.asarray(logits, jnp.float32), size, align_corners)
    return np.asarray(jnp.argmax(up, axis=-1))


@pytest.mark.parametrize(
    "in_hw,out_hw,c", [((17, 17), (65, 65), 21), ((9, 11), (33, 45), 7),
                       ((16, 16), (64, 64), 5)]
)
def test_upsample_argmax_matches_oracle(in_hw, out_hw, c, rng):
    logits = rng.standard_normal((2, *in_hw, c)).astype(np.float32)
    got = np.asarray(
        upsample_argmax(jnp.asarray(logits), out_hw, interpret=True)
    )
    ref = _oracle(logits, out_hw)
    np.testing.assert_array_equal(got, ref)


def test_upsample_argmax_tie_breaking():
    """Equal logits everywhere -> argmax must pick class 0 (first max)."""
    logits = np.zeros((1, 8, 8, 4), np.float32)
    got = np.asarray(upsample_argmax(jnp.asarray(logits), (16, 16), interpret=True))
    np.testing.assert_array_equal(got, 0)


def test_non_dividing_output_rows(rng):
    """HO=65 is not a multiple of the 32-row tile; padded blocks must not
    corrupt the output."""
    logits = rng.standard_normal((1, 17, 17, 3)).astype(np.float32)
    got = np.asarray(upsample_argmax(jnp.asarray(logits), (65, 65), interpret=True))
    np.testing.assert_array_equal(got, _oracle(logits, (65, 65)))


def test_predict_labels_dispatch_cpu(rng):
    """On CPU predict_labels takes the resize+argmax oracle branch, so
    pin it against the OTHER implementation (the interpreted Pallas
    kernel) — comparing it to _oracle would be f(x) == f(x)."""
    logits = rng.standard_normal((1, 9, 9, 4)).astype(np.float32)
    got = np.asarray(predict_labels(jnp.asarray(logits), (33, 33)))
    kernel = np.asarray(
        upsample_argmax(jnp.asarray(logits), (33, 33), interpret=True)
    )
    np.testing.assert_array_equal(got, kernel)


@pytest.mark.parametrize("bsz", [17, 23, 24, 32])
def test_large_batch_chunking(bsz, rng):
    """Batches above _MAX_B take the lax.map chunked path (Mosaic scoped
    VMEM degrades past ~16 rows at 513² — DESIGN.md); output must be
    bit-identical to the oracle across the chunk boundaries."""
    logits = rng.standard_normal((bsz, 9, 9, 5)).astype(np.float32)
    got = np.asarray(
        upsample_argmax(jnp.asarray(logits), (33, 33), interpret=True)
    )
    np.testing.assert_array_equal(got, _oracle(logits, (33, 33)))
