"""Golden parity: bilinear/nearest resize vs torch.nn.functional.

align_corners=True bilinear is load-bearing for mIoU parity with the
reference (SURVEY.md §3.2), so it is pinned against the torch oracle
exactly, for up- and downsampling, odd and even sizes.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from zs3_tpu.ops.resize import resize_bilinear, resize_nearest


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize(
    "in_size,out_size",
    [((33, 33), (129, 129)), ((129, 129), (513, 513)), ((17, 23), (5, 9)),
     ((8, 8), (8, 8)), ((1, 7), (4, 14))],
)
def test_bilinear_matches_torch(in_size, out_size, align_corners, rng):
    x = rng.standard_normal((2, *in_size, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), out_size, align_corners))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.interpolate(
        xt, size=out_size, mode="bilinear", align_corners=align_corners
    ).permute(0, 2, 3, 1).numpy()
    # separable-matmul accumulation order differs from torch's per-pixel
    # lerp; 1e-4 absolute is tight for f32 while still catching any
    # index/weight semantics drift.
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_bilinear_hwc_squeeze(rng):
    x = rng.standard_normal((16, 16, 4)).astype(np.float32)
    out = resize_bilinear(jnp.asarray(x), (32, 32))
    assert out.shape == (32, 32, 4)


def test_bilinear_preserves_dtype(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 2)), dtype=jnp.bfloat16)
    assert resize_bilinear(x, (16, 16)).dtype == jnp.bfloat16


@pytest.mark.parametrize(
    "in_size,out_size", [((10, 10), (5, 5)), ((7, 9), (14, 18)), ((4, 4), (4, 4))]
)
def test_nearest_matches_torch(in_size, out_size, rng):
    x = rng.integers(0, 21, (2, *in_size)).astype(np.int32)
    ours = np.asarray(resize_nearest(jnp.asarray(x), out_size))
    ref = (
        F.interpolate(
            torch.from_numpy(x).float()[:, None], size=out_size, mode="nearest"
        )[:, 0]
        .long()
        .numpy()
    )
    np.testing.assert_array_equal(ours, ref)
