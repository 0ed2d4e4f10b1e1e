"""Golden parity for the non-resnet backbones + full-depth ResNet-101.

Each converter (zs3_tpu/utils/torch_convert.py) is validated against a
torch oracle that uses the upstream checkpoint naming; outputs of the
flax backbone under converted weights must match the oracle's.  Random
BN stats + weights exercise every affine term.  These tests are the
pretrained-weight guarantee for all five reference backbones
(SURVEY.md §2.2, §7 "parity, not vibes").
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.test_torch_parity import _randomize_bn_stats
from zs3_tpu.utils.torch_convert import (
    assert_tree_shapes_match,
    convert_backbone,
)


def _parity_case(tmodel, fmodel, x, atol_low, atol_high, backbone):
    with torch.no_grad():
        _randomize_bn_stats(tmodel, seed=3)
    tmodel.eval()
    params, stats = convert_backbone(backbone, tmodel.state_dict())
    ref_vars = fmodel.init(jax.random.key(0), jnp.asarray(x))
    assert_tree_shapes_match(ref_vars["params"], params)
    assert_tree_shapes_match(ref_vars["batch_stats"], stats)
    variables = {"params": params, "batch_stats": stats}
    with torch.no_grad():
        t_high, t_low = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    f_high, f_low = jax.jit(
        lambda v, a: fmodel.apply(v, a, train=False)
    )(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(f_low), t_low.permute(0, 2, 3, 1).numpy(), atol=atol_low
    )
    np.testing.assert_allclose(
        np.asarray(f_high), t_high.permute(0, 2, 3, 1).numpy(), atol=atol_high
    )


@pytest.mark.slow
@pytest.mark.parametrize("output_stride", [16, 8])
def test_mobilenet_parity(output_stride, rng):
    from tests.torch_oracle_backbones import TorchMobileNetV2
    from zs3_tpu.models.mobilenet import MobileNetV2Backbone

    torch.manual_seed(10)
    _parity_case(
        TorchMobileNetV2(output_stride),
        MobileNetV2Backbone(output_stride=output_stride),
        rng.standard_normal((1, 65, 65, 3)).astype(np.float32),
        # shallow low-level path vs 17-block high path (relu6-bounded
        # activations keep accumulation error small)
        atol_low=1e-4, atol_high=1e-3, backbone="mobilenet",
    )


@pytest.mark.slow
@pytest.mark.parametrize("output_stride", [16, 8])
def test_xception_parity(output_stride, rng):
    from tests.torch_oracle_backbones import TorchAlignedXception
    from zs3_tpu.models.xception import AlignedXception

    torch.manual_seed(11)
    _parity_case(
        TorchAlignedXception(output_stride),
        AlignedXception(output_stride=output_stride),
        rng.standard_normal((1, 65, 65, 3)).astype(np.float32),
        # 20 blocks of residual accumulation at 728-2048ch
        atol_low=1e-4, atol_high=5e-3, backbone="xception",
    )


@pytest.mark.slow
def test_drn54_parity(rng):
    from tests.torch_oracle_backbones import TorchDRN54
    from zs3_tpu.models.drn import DRN54

    torch.manual_seed(12)
    _parity_case(
        TorchDRN54(),
        DRN54(),
        rng.standard_normal((1, 65, 65, 3)).astype(np.float32),
        atol_low=1e-4, atol_high=5e-3, backbone="drn",
    )


@pytest.mark.slow
def test_resnet101_full_depth_parity(rng):
    """Full (3,4,23,3) depth at 129^2: exercises all three multi-grid
    entries of layer4 (the (2,2,2,2) toy never touches grid index 2)
    and 23-block accumulation error at realistic feature sizes, on a
    torchvision-named R101 state_dict round-trip (VERDICT r1 #4)."""
    from tests.torch_oracle import ResNetAtrous as TorchResNet
    from zs3_tpu.models.resnet import ResNetAtrous

    torch.manual_seed(13)
    tmodel = TorchResNet(layers=(3, 4, 23, 3), output_stride=16)
    with torch.no_grad():
        _randomize_bn_stats(tmodel, seed=13)
    tmodel.eval()
    params, stats = convert_backbone("resnet101", tmodel.state_dict())
    fmodel = ResNetAtrous(layers=(3, 4, 23, 3), output_stride=16)
    x = rng.standard_normal((1, 129, 129, 3)).astype(np.float32)
    ref_vars = fmodel.init(jax.random.key(0), jnp.asarray(x))
    assert_tree_shapes_match(ref_vars["params"], params)
    assert_tree_shapes_match(ref_vars["batch_stats"], stats)
    variables = {"params": params, "batch_stats": stats}
    with torch.no_grad():
        t_high, t_low = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    f_high, f_low = jax.jit(
        lambda v, a: fmodel.apply(v, a, train=False)
    )(variables, jnp.asarray(x))
    t_high = t_high.permute(0, 2, 3, 1).numpy()
    t_low = t_low.permute(0, 2, 3, 1).numpy()
    # tolerances: f32 conv reduction-order drift compounds over 33
    # bottlenecks; normalize by the activation scale so the bound is
    # meaningful independent of the random-weight magnitudes.
    scale_high = np.abs(t_high).max()
    scale_low = np.abs(t_low).max()
    rel_high = np.abs(np.asarray(f_high) - t_high).max() / scale_high
    rel_low = np.abs(np.asarray(f_low) - t_low).max() / scale_low
    assert rel_low < 1e-4, f"low-level rel err {rel_low}"
    assert rel_high < 1e-3, f"high-level rel err {rel_high}"
