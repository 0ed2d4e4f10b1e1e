"""Golden parity: torch oracle -> converter -> flax, outputs must match.

This is the weight-port guarantee (SURVEY.md §7 "parity, not vibes"):
conv padding for stride/dilation, BN eval semantics, maxpool padding,
multigrid plan, ASPP pooling branch and align_corners upsampling all
verified in one shot by comparing full-network outputs on random
weights.  Random (untrained) BN stats + weights exercise every term of
the affine transforms.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.torch_oracle import ResNetAtrous as TorchResNet, TorchDeepLab
from zs3_tpu.models.deeplab import DeepLab
from zs3_tpu.models.resnet import ResNetAtrous
from zs3_tpu.utils.torch_convert import (
    assert_tree_shapes_match,
    convert_deeplab_state_dict,
    convert_torchvision_resnet,
    graft_encoder,
)


def _randomize_bn_stats(module: torch.nn.Module, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
            m.weight.data.copy_(torch.randn(m.weight.shape, generator=g) * 0.2 + 1.0)
            m.bias.data.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)


@pytest.mark.parametrize("output_stride", [16, 8])
def test_resnet_backbone_parity(output_stride, rng):
    torch.manual_seed(0)
    tmodel = TorchResNet(layers=(2, 2, 2, 2), output_stride=output_stride)
    with torch.no_grad():
        _randomize_bn_stats(tmodel)
    tmodel.eval()

    params, stats = convert_torchvision_resnet(tmodel.state_dict())
    fmodel = ResNetAtrous(layers=(2, 2, 2, 2), output_stride=output_stride)
    x = rng.standard_normal((1, 65, 65, 3)).astype(np.float32)
    ref_vars = fmodel.init(jax.random.key(0), jnp.asarray(x))
    assert_tree_shapes_match(ref_vars["params"], params)
    assert_tree_shapes_match(ref_vars["batch_stats"], stats)
    variables = {"params": params, "batch_stats": stats}

    with torch.no_grad():
        t_high, t_low = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    f_high, f_low = fmodel.apply(variables, jnp.asarray(x), train=False)

    np.testing.assert_allclose(
        np.asarray(f_low), t_low.permute(0, 2, 3, 1).numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(f_high), t_high.permute(0, 2, 3, 1).numpy(), atol=2e-3
    )


def test_full_deeplab_parity(rng):
    torch.manual_seed(1)
    tmodel = TorchDeepLab(num_classes=7, output_stride=16, layers=(2, 2, 2, 2))
    with torch.no_grad():
        _randomize_bn_stats(tmodel, seed=1)
    tmodel.eval()

    params, stats = convert_deeplab_state_dict(tmodel.state_dict())
    x = rng.standard_normal((1, 65, 65, 3)).astype(np.float32)
    variables = {"params": params, "batch_stats": stats}

    # flax apply needs a module whose encoder depth matches the (2,2,2,2)
    # oracle; assemble one from the same building blocks.
    from zs3_tpu.models.aspp import ASPP
    from zs3_tpu.models.decoder import Decoder
    from zs3_tpu.models.resnet import ResNetAtrous as FlaxResNet
    import flax.linen as nn

    class TinyDeepLab(nn.Module):
        num_classes: int = 7

        def setup(self):
            self.encoder = FlaxResNet(layers=(2, 2, 2, 2), output_stride=16)
            self.aspp = ASPP(output_stride=16, dropout=False)
            self.decoder = Decoder(num_classes=self.num_classes, dropout=False)

        def __call__(self, x, train=False):
            high, low = self.encoder(x, train=train)
            y = self.aspp(high, train=train)
            logits = self.decoder(y, low, train=train)
            from zs3_tpu.ops.resize import resize_bilinear

            return resize_bilinear(logits.astype(jnp.float32), x.shape[1:3])

    fmodel = TinyDeepLab()
    ref_vars = fmodel.init(jax.random.key(0), jnp.zeros((1, 65, 65, 3)))
    assert_tree_shapes_match(ref_vars["params"], params)
    assert_tree_shapes_match(ref_vars["batch_stats"], stats)

    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    f_out = fmodel.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        np.asarray(f_out), t_out.permute(0, 2, 3, 1).numpy(), atol=5e-3
    )
    # agreement also at the argmax level (what mIoU sees)
    t_pred = t_out.argmax(1).numpy()
    f_pred = np.asarray(jnp.argmax(f_out, -1))
    assert (t_pred == f_pred).mean() > 0.999


def test_converter_rejects_garbage():
    with pytest.raises(ValueError):
        convert_torchvision_resnet({"not_a_real_key.weight": np.zeros((1,))})


@pytest.mark.parametrize("naming", ["sequential", "fc"])
def test_gmmn_converter_parity(naming):
    """A torch GMMNnetwork-shaped MLP (Linear + LeakyReLU 0.2 + Linear +
    ReLU, reference zs3/modeling/gmmn.py class GMMNnetwork) converts to
    GMMNGenerator params that reproduce its forward exactly, under both
    public checkpoint namings (main.K Sequential / fc1,fc2)."""
    from zs3_tpu.models.gmmn import GMMNGenerator
    from zs3_tpu.utils.torch_convert import convert_gmmn

    embed_dim, noise_dim, hidden, feat = 12, 10, 32, 16
    torch.manual_seed(7)
    tmodel = torch.nn.Sequential(
        torch.nn.Linear(embed_dim + noise_dim, hidden),
        torch.nn.LeakyReLU(0.2),
        torch.nn.Dropout(0.0),
        torch.nn.Linear(hidden, feat),
        torch.nn.ReLU(),
    )
    tmodel.eval()
    sd = tmodel.state_dict()  # keys 0.weight, 0.bias, 3.weight, 3.bias
    if naming == "fc":
        sd = {
            {"0": "fc1", "3": "fc2"}[k.split(".")[0]] + "." + k.split(".")[1]: v
            for k, v in sd.items()
        }
    else:
        sd = {f"main.{k}": v for k, v in sd.items()}
    params = convert_gmmn(sd)

    fmodel = GMMNGenerator(
        noise_dim=noise_dim, embed_dim=embed_dim, hidden_dim=hidden,
        feature_dim=feat, num_hidden=1,
    )
    ref = fmodel.init(
        jax.random.key(0), jnp.zeros((1, embed_dim)), jnp.zeros((1, noise_dim))
    )
    assert_tree_shapes_match(ref["params"], params)

    rng = np.random.default_rng(3)
    emb = rng.standard_normal((5, embed_dim)).astype(np.float32)
    noise = rng.standard_normal((5, noise_dim)).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(np.concatenate([emb, noise], -1)))
    f_out = fmodel.apply({"params": params}, jnp.asarray(emb), jnp.asarray(noise))
    np.testing.assert_allclose(np.asarray(f_out), t_out.numpy(), atol=1e-5)


def test_gmmn_converter_sorted_key_order():
    """A re-serialized checkpoint (safetensors/json) iterates keys
    lexicographically — 'main.10' before 'main.2'.  With equal hidden
    widths the shapes still line up, so a converter relying on insertion
    order would graft swapped hidden layers silently.  Sequential-style
    prefixes must be ordered by their numeric index."""
    from zs3_tpu.models.gmmn import GMMNGenerator
    from zs3_tpu.utils.torch_convert import convert_gmmn

    embed_dim, noise_dim, hidden, feat = 6, 4, 8, 5
    torch.manual_seed(11)
    tmodel = torch.nn.Sequential(
        torch.nn.Linear(embed_dim + noise_dim, hidden),   # main.0
        torch.nn.LeakyReLU(0.2), torch.nn.Dropout(0.0),
        torch.nn.Linear(hidden, hidden),                  # main.3 (same width)
        torch.nn.LeakyReLU(0.2),
        # identity index fillers so the last Linear lands at index 10
        torch.nn.Dropout(0.0), torch.nn.Dropout(0.0),
        torch.nn.Dropout(0.0), torch.nn.Dropout(0.0), torch.nn.Dropout(0.0),
        torch.nn.Linear(hidden, feat),                    # main.10
        torch.nn.ReLU(),
    )
    tmodel.eval()
    sd = {f"main.{k}": v for k, v in tmodel.state_dict().items()}
    resorted = {k: sd[k] for k in sorted(sd)}  # main.10 now precedes main.3
    assert list(resorted) != list(sd)
    params = convert_gmmn(resorted)

    fmodel = GMMNGenerator(
        noise_dim=noise_dim, embed_dim=embed_dim, hidden_dim=hidden,
        feature_dim=feat, num_hidden=2,
    )
    rng = np.random.default_rng(5)
    emb = rng.standard_normal((4, embed_dim)).astype(np.float32)
    noise = rng.standard_normal((4, noise_dim)).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(np.concatenate([emb, noise], -1)))
    f_out = fmodel.apply({"params": params}, jnp.asarray(emb), jnp.asarray(noise))
    np.testing.assert_allclose(np.asarray(f_out), t_out.numpy(), atol=1e-5)


def test_gmmn_converter_rejects_garbage():
    from zs3_tpu.utils.torch_convert import convert_gmmn

    with pytest.raises(ValueError):
        convert_gmmn({"main.0.weight": np.zeros((2, 3, 4))})  # conv, not Linear
    with pytest.raises(ValueError):
        convert_gmmn({})
