"""torch state_dict -> flax variables converter.

The reference pulls ImageNet ResNet-101 weights from the torchvision
model zoo at runtime (reference: zs3/modeling/backbone/resnet.py
_load_pretrained_model).  This environment has no network, so pretrained
initialization flows through this converter instead: a locally provided
``.pth`` state_dict (torchvision naming) becomes the ``encoder`` subtree
of a DeepLab variable tree.  Layout notes:

  * conv kernels transpose OIHW -> HWIO (NCHW reference vs NHWC here);
  * BN maps weight->scale, bias->bias (params) and running_mean->mean,
    running_var->var (batch_stats);
  * torchvision block names (layer1.0.conv1, downsample.0/1, ...) map to
    flax module names (layer1_block0/conv1, downsample_conv/bn).

`convert_deeplab_state_dict` additionally understands the full-network
naming used by the torch oracle in tests/torch_oracle.py (aspp1..4,
global_pool, project, low_proj, fuse1/2, classifier) so whole-model
golden parity is testable without torchvision.

Scope: ResNet-family backbones only.  The reference's pretrained
Xception/DRN/MobileNet checkpoints use bespoke namings from their
respective upstreams; extend the mapping tables here when such files are
actually available to validate against.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv_kernel(t) -> np.ndarray:
    return _np(t).transpose(2, 3, 1, 0).astype(np.float32)  # OIHW -> HWIO


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def convert_torchvision_resnet(
    state_dict: Mapping[str, Any],
) -> Tuple[Dict, Dict]:
    """torchvision ResNet state_dict -> (params, batch_stats) subtrees
    for zs3_tpu.models.resnet.ResNetAtrous.

    fc.* entries are ignored (the classification head has no analog).
    """
    params: Dict = {}
    stats: Dict = {}
    for name, tensor in state_dict.items():
        if name.startswith("fc."):
            continue
        parts = name.split(".")
        if parts[0] == "conv1":
            _set(params, ("stem_conv", "conv", "kernel"), _conv_kernel(tensor))
        elif parts[0] == "bn1":
            _convert_bn(params, stats, ("stem_bn", "bn"), parts[1], tensor)
        elif re.fullmatch(r"layer[1-4]", parts[0]):
            layer = parts[0]
            block = f"{layer}_block{parts[1]}"
            sub = parts[2]
            if sub.startswith("conv"):
                _set(params, (block, sub, "conv", "kernel"), _conv_kernel(tensor))
            elif sub.startswith("bn"):
                _convert_bn(params, stats, (block, sub, "bn"), parts[3], tensor)
            elif sub == "downsample":
                if parts[3] == "0":  # conv
                    _set(
                        params,
                        (block, "downsample_conv", "conv", "kernel"),
                        _conv_kernel(tensor),
                    )
                else:  # 1 = bn
                    _convert_bn(
                        params, stats, (block, "downsample_bn", "bn"), parts[4], tensor
                    )
            else:
                raise ValueError(f"unrecognized resnet entry: {name}")
        elif name.endswith("num_batches_tracked"):
            continue
        else:
            raise ValueError(f"unrecognized resnet entry: {name}")
    return params, stats


def _convert_bn(params, stats, path, field, tensor):
    value = _np(tensor).astype(np.float32)
    if field == "weight":
        _set(params, path + ("scale",), value)
    elif field == "bias":
        _set(params, path + ("bias",), value)
    elif field == "running_mean":
        _set(stats, path + ("mean",), value)
    elif field == "running_var":
        _set(stats, path + ("var",), value)
    elif field == "num_batches_tracked":
        pass
    else:
        raise ValueError(f"unrecognized bn field {field} at {path}")


# torch-oracle module name -> flax path prefix inside the DeepLab tree.
_DEEPLAB_CONVBN = {
    "aspp1": ("aspp", "aspp1"),
    "aspp2": ("aspp", "aspp2"),
    "aspp3": ("aspp", "aspp3"),
    "aspp4": ("aspp", "aspp4"),
    "global_pool": ("aspp", "global_pool"),
    "project": ("aspp", "project"),
    "low_proj": ("decoder", "low_proj"),
    "fuse1": ("decoder", "fuse1"),
    "fuse2": ("decoder", "fuse2"),
}


def convert_deeplab_state_dict(
    state_dict: Mapping[str, Any],
) -> Tuple[Dict, Dict]:
    """Full torch DeepLab (tests/torch_oracle.py naming) -> variables.

    Expects 'backbone.<torchvision-resnet-name>' for the encoder plus
    '<block>.conv.weight' / '<block>.bn.<field>' for each ConvBN block in
    _DEEPLAB_CONVBN and 'classifier.{weight,bias}'.
    """
    backbone = {
        k[len("backbone.") :]: v
        for k, v in state_dict.items()
        if k.startswith("backbone.")
    }
    enc_params, enc_stats = convert_torchvision_resnet(backbone)
    params: Dict = {"encoder": enc_params}
    stats: Dict = {"encoder": enc_stats}
    for name, tensor in state_dict.items():
        if name.startswith("backbone."):
            continue
        parts = name.split(".")
        block = parts[0]
        if block == "classifier":
            if parts[1] == "weight":
                _set(
                    params,
                    ("decoder", "classifier", "conv", "kernel"),
                    _conv_kernel(tensor),
                )
            else:
                _set(
                    params,
                    ("decoder", "classifier", "conv", "bias"),
                    _np(tensor).astype(np.float32),
                )
        elif block in _DEEPLAB_CONVBN:
            prefix = _DEEPLAB_CONVBN[block]
            if parts[1] == "conv":
                _set(params, prefix + ("conv", "conv", "kernel"), _conv_kernel(tensor))
            elif parts[1] == "bn":
                _convert_bn(params, stats, prefix + ("bn", "bn"), parts[2], tensor)
            else:
                raise ValueError(f"unrecognized deeplab entry: {name}")
        else:
            raise ValueError(f"unrecognized deeplab entry: {name}")
    return params, stats


def graft_encoder(variables: Dict, params: Dict, stats: Dict) -> Dict:
    """Return a variable tree with the encoder subtrees replaced."""
    out_params = dict(variables["params"])
    out_params["encoder"] = params
    out_stats = dict(variables.get("batch_stats", {}))
    out_stats["encoder"] = stats
    return {**variables, "params": out_params, "batch_stats": out_stats}


def load_pretrained_resnet(variables: Dict, pth_path: str) -> Dict:
    """Load a torchvision ResNet .pth from disk and graft it as encoder."""
    import torch

    state_dict = torch.load(pth_path, map_location="cpu", weights_only=True)
    if "state_dict" in state_dict:
        state_dict = state_dict["state_dict"]
    params, stats = convert_torchvision_resnet(state_dict)
    return graft_encoder(variables, params, stats)


def assert_tree_shapes_match(expected, got, path=""):
    """Diagnostic: compare two pytrees' leaf shapes, raising with the
    first mismatching path (used to validate conversions)."""
    if isinstance(expected, dict):
        missing = set(expected) - set(got)
        extra = set(got) - set(expected)
        if missing or extra:
            raise ValueError(
                f"tree mismatch at {path!r}: missing={sorted(missing)} "
                f"extra={sorted(extra)}"
            )
        for key in expected:
            assert_tree_shapes_match(expected[key], got[key], f"{path}/{key}")
    else:
        if tuple(np.shape(expected)) != tuple(np.shape(got)):
            raise ValueError(
                f"shape mismatch at {path!r}: "
                f"{np.shape(expected)} vs {np.shape(got)}"
            )
