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

All five reference backbones convert:

  * ResNet-50/101 — torchvision naming (`convert_torchvision_resnet`);
  * AlignedXception — the reference's vendored naming (conv1/bn1/conv2/
    bn2, blockN.rep.<i> Sequentials of [ReLU, SeparableConv2d, BN],
    blockN.skip/skipbn, conv3..5 + bn3..5), `convert_xception`;
  * MobileNetV2 — the reference's flat `features.N.conv.K` Sequential
    naming (jfzhang95-lineage checkpoint format), `convert_mobilenet_v2`;
  * DRN-D-54 — fyu/drn naming (layer0..layer8 Sequentials with
    Bottleneck submodules), `convert_drn`.

The non-resnet namings are reconstructed from the upstream lineage
([M] confidence — the reference mount is empty, SURVEY.md §0); each is
validated against a same-named torch oracle in
tests/torch_oracle_backbones.py, so converter mechanics (layout
transposes, BN field routing, Sequential index arithmetic) are golden-
tested even without the upstream files.
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


# --- AlignedXception ---------------------------------------------------
# Every reference block has exactly 3 separable units (the strided /
# is_last extra keeps the count stride-independent); only whether the
# leading ReLU was dropped (start_with_relu=False, block1) shifts the
# Sequential indices.
def _xception_rep_indices(start_with_relu: bool, n_units: int = 3):
    """Sequential index of each unit's (SeparableConv2d, trailing BN)."""
    out = []
    for r in range(n_units):
        if start_with_relu:
            out.append((3 * r + 1, 3 * r + 2))
        else:
            out.append((0, 1) if r == 0 else (3 * r, 3 * r + 1))
    return out


_XCEPTION_SWR = {"block1": False}  # all other blocks start with relu


def convert_xception(state_dict: Mapping[str, Any]) -> Tuple[Dict, Dict]:
    """Reference AlignedXception state_dict -> (params, batch_stats)
    for zs3_tpu.models.xception.AlignedXception."""
    params: Dict = {}
    stats: Dict = {}
    # Precompute rep-index -> (sep name, role) per block.
    rep_maps: Dict[str, Dict[int, Tuple[str, str]]] = {}
    for b in range(1, 21):
        name = f"block{b}"
        idxs = _xception_rep_indices(_XCEPTION_SWR.get(name, True))
        m: Dict[int, Tuple[str, str]] = {}
        for r, (sep_i, bn_i) in enumerate(idxs):
            m[sep_i] = (f"sep{r}", "sep")
            m[bn_i] = (f"sep{r}", "bn_point")
        rep_maps[name] = m

    for name, tensor in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        parts = name.split(".")
        head = parts[0]
        if head in ("conv1", "conv2"):
            _set(params, (head, "conv", "kernel"), _conv_kernel(tensor))
        elif head in ("bn1", "bn2"):
            _convert_bn(params, stats, (head, "bn"), parts[1], tensor)
        elif head in ("conv3", "conv4", "conv5"):
            # SeparableConv2d: conv1 = depthwise, bn = bn_depth, pointwise
            sub = parts[1]
            if sub == "conv1":
                _set(params, (head, "depthwise", "conv", "kernel"),
                     _conv_kernel(tensor))
            elif sub == "bn":
                _convert_bn(params, stats, (head, "bn_depth", "bn"),
                            parts[2], tensor)
            elif sub == "pointwise":
                _set(params, (head, "pointwise", "conv", "kernel"),
                     _conv_kernel(tensor))
            else:
                raise ValueError(f"unrecognized xception entry: {name}")
        elif head in ("bn3", "bn4", "bn5"):
            # module-level BN after conv3..5 = the unit's bn_point
            conv = "conv" + head[-1]
            _convert_bn(params, stats, (conv, "bn_point", "bn"), parts[1], tensor)
        elif re.fullmatch(r"block\d+", head):
            if parts[1] == "skip":
                _set(params, (head, "skip_conv", "conv", "kernel"),
                     _conv_kernel(tensor))
            elif parts[1] == "skipbn":
                _convert_bn(params, stats, (head, "skip_bn", "bn"),
                            parts[2], tensor)
            elif parts[1] == "rep":
                idx = int(parts[2])
                sep_name, role = rep_maps[head][idx]
                if role == "bn_point":
                    _convert_bn(params, stats, (head, sep_name, "bn_point", "bn"),
                                parts[3], tensor)
                else:
                    sub = parts[3]
                    if sub == "conv1":
                        _set(params, (head, sep_name, "depthwise", "conv", "kernel"),
                             _conv_kernel(tensor))
                    elif sub == "bn":
                        _convert_bn(params, stats,
                                    (head, sep_name, "bn_depth", "bn"),
                                    parts[4], tensor)
                    elif sub == "pointwise":
                        _set(params, (head, sep_name, "pointwise", "conv", "kernel"),
                             _conv_kernel(tensor))
                    else:
                        raise ValueError(f"unrecognized xception entry: {name}")
            else:
                raise ValueError(f"unrecognized xception entry: {name}")
        elif head == "fc" or head == "classifier":
            continue  # classification head has no analog
        else:
            raise ValueError(f"unrecognized xception entry: {name}")
    return params, stats


# --- MobileNetV2 ---------------------------------------------------------
def convert_mobilenet_v2(state_dict: Mapping[str, Any]) -> Tuple[Dict, Dict]:
    """Reference MobileNetV2 state_dict (flat `features.N.conv.K`
    Sequential naming) -> (params, batch_stats) for
    zs3_tpu.models.mobilenet.MobileNetV2Backbone.

    features.0 is the stem ConvBNReLU; features.N (N>=1) is block N-1.
    Block N==1 has expand ratio 1 (no expand conv): conv indices
    (0,1,3,4) = (depthwise, bn, project, bn); N>=2: (0,1,3,4,6,7) =
    (expand, bn, depthwise, bn, project, bn)."""
    params: Dict = {}
    stats: Dict = {}
    narrow = {0: ("depthwise",), 1: ("depthwise_bn",), 3: ("project_conv",),
              4: ("project_bn",)}
    wide = {0: ("expand_conv",), 1: ("expand_bn",), 3: ("depthwise",),
            4: ("depthwise_bn",), 6: ("project_conv",), 7: ("project_bn",)}
    for name, tensor in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        parts = name.split(".")
        if parts[0] != "features":
            if parts[0] == "classifier":
                continue
            raise ValueError(f"unrecognized mobilenet entry: {name}")
        n = int(parts[1])
        if n == 0:
            if parts[2] == "0":
                _set(params, ("stem_conv", "conv", "kernel"), _conv_kernel(tensor))
            else:
                _convert_bn(params, stats, ("stem_bn", "bn"), parts[3], tensor)
            continue
        block = f"block{n - 1}"
        if parts[2] != "conv":
            raise ValueError(f"unrecognized mobilenet entry: {name}")
        k = int(parts[3])
        table = narrow if n == 1 else wide
        if k not in table:
            raise ValueError(f"unrecognized mobilenet entry: {name}")
        target = table[k][0]
        if target.endswith("_bn"):
            _convert_bn(params, stats, (block, target, "bn"), parts[4], tensor)
        else:
            _set(params, (block, target, "conv", "kernel"), _conv_kernel(tensor))
    return params, stats


# --- DRN-D-54 ------------------------------------------------------------
def convert_drn(state_dict: Mapping[str, Any]) -> Tuple[Dict, Dict]:
    """fyu/drn arch-D state_dict -> (params, batch_stats) for
    zs3_tpu.models.drn.DRN54.

    layer0 = stem Sequential(conv, bn); layer1/2/7/8 = conv levels
    (Sequential of [conv, bn, relu] repeats); layer3..6 = Bottleneck
    stages with torchvision-style block naming."""
    params: Dict = {}
    stats: Dict = {}
    conv_levels = {"layer1": "level1", "layer2": "level2",
                   "layer7": "level7", "layer8": "level8"}
    res_levels = {"layer3": "level3", "layer4": "level4",
                  "layer5": "level5", "layer6": "level6"}
    for name, tensor in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        parts = name.split(".")
        head = parts[0]
        if head == "layer0":
            if parts[1] == "0":
                _set(params, ("stem_conv", "conv", "kernel"), _conv_kernel(tensor))
            else:
                _convert_bn(params, stats, ("stem_bn", "bn"), parts[2], tensor)
        elif head in conv_levels:
            level = conv_levels[head]
            idx = int(parts[1])
            if idx % 3 == 0:  # conv at 0, 3, 6, ...
                _set(params, (level, f"conv{idx // 3}", "conv", "kernel"),
                     _conv_kernel(tensor))
            elif idx % 3 == 1:  # bn at 1, 4, 7, ...
                _convert_bn(params, stats, (level, f"bn{idx // 3}", "bn"),
                            parts[2], tensor)
            else:
                raise ValueError(f"unrecognized drn entry: {name}")
        elif head in res_levels:
            block = f"{res_levels[head]}_block{parts[1]}"
            sub = parts[2]
            if sub.startswith("conv"):
                _set(params, (block, sub, "conv", "kernel"), _conv_kernel(tensor))
            elif sub.startswith("bn"):
                _convert_bn(params, stats, (block, sub, "bn"), parts[3], tensor)
            elif sub == "downsample":
                if parts[3] == "0":
                    _set(params, (block, "downsample_conv", "conv", "kernel"),
                         _conv_kernel(tensor))
                else:
                    _convert_bn(params, stats, (block, "downsample_bn", "bn"),
                                parts[4], tensor)
            else:
                raise ValueError(f"unrecognized drn entry: {name}")
        elif head == "fc":
            continue
        else:
            raise ValueError(f"unrecognized drn entry: {name}")
    return params, stats


def convert_gmmn(state_dict: Mapping[str, Any]) -> Dict:
    """torch GMMNnetwork (MLP) state_dict -> params for
    zs3_tpu.models.gmmn.GMMNGenerator.

    The reference generator (zs3/modeling/gmmn.py class GMMNnetwork,
    [M] confidence — empty mount, SURVEY.md §0) is a small Linear MLP;
    public checkpoints name its layers either as a Sequential
    (`main.0.weight`, `main.3.weight`, ...) or as `fc1`/`fc2`.  Both are
    handled uniformly: parameterized layers are taken in state_dict
    order (activations/dropout hold no tensors, so Sequential index gaps
    are irrelevant), all but the last become hidden0..hiddenN-2 and the
    last becomes `out`.  Linear weight (out,in) transposes to Dense
    kernel (in,out).

    When every prefix is Sequential-style (`<base>.<int>`), layers are
    ordered by the numeric index rather than state_dict insertion order:
    a checkpoint re-serialized with lexicographically sorted keys
    (safetensors, json) puts `main.10` before `main.2`, and with equal
    hidden widths the shapes still match — the graft would silently
    swap hidden layers.
    """
    order = []
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    for name, tensor in state_dict.items():
        if "." in name:
            prefix, field = name.rsplit(".", 1)
        else:
            prefix, field = "", name
        if field not in ("weight", "bias"):
            raise ValueError(f"unrecognized gmmn entry: {name}")
        arr = _np(tensor).astype(np.float32)
        if field == "weight" and arr.ndim != 2:
            raise ValueError(
                f"gmmn converter expects 2-D Linear weights; "
                f"{name} has shape {arr.shape}"
            )
        if prefix not in groups:
            groups[prefix] = {}
            order.append(prefix)
        groups[prefix][field] = arr
    if not order:
        raise ValueError("no Linear layers found in gmmn state_dict")

    def _seq_index(prefix: str):
        base, _, idx = prefix.rpartition(".")
        return (base, int(idx)) if idx.isdigit() else None

    seq = [_seq_index(p) for p in order]
    if all(s is not None for s in seq) and len({s[0] for s in seq}) == 1:
        order.sort(key=lambda p: _seq_index(p)[1])
    params: Dict = {}
    for i, prefix in enumerate(order):
        group = groups[prefix]
        if "weight" not in group:
            raise ValueError(f"gmmn layer {prefix!r} has no weight")
        flax_name = "out" if i == len(order) - 1 else f"hidden{i}"
        entry = {"kernel": group["weight"].T}
        if "bias" in group:
            entry["bias"] = group["bias"]
        params[flax_name] = entry
    return params


_BACKBONE_CONVERTERS = {
    "resnet50": convert_torchvision_resnet,
    "resnet101": convert_torchvision_resnet,
    "xception": convert_xception,
    "mobilenet": convert_mobilenet_v2,
    "drn": convert_drn,
}


def convert_backbone(backbone: str, state_dict: Mapping[str, Any]) -> Tuple[Dict, Dict]:
    """Dispatch to the right converter for a backbone name."""
    if backbone not in _BACKBONE_CONVERTERS:
        raise ValueError(
            f"no converter for backbone {backbone!r}; "
            f"available: {sorted(_BACKBONE_CONVERTERS)}"
        )
    return _BACKBONE_CONVERTERS[backbone](state_dict)


def graft_encoder(variables: Dict, params: Dict, stats: Dict) -> Dict:
    """Return a variable tree with the encoder subtrees replaced."""
    out_params = dict(variables["params"])
    out_params["encoder"] = params
    out_stats = dict(variables.get("batch_stats", {}))
    out_stats["encoder"] = stats
    return {**variables, "params": out_params, "batch_stats": out_stats}


def load_pretrained_resnet(variables: Dict, pth_path: str) -> Dict:
    """Load a torchvision ResNet .pth from disk and graft it as encoder."""
    return load_pretrained_backbone(variables, pth_path, "resnet101")


def load_pretrained_backbone(
    variables: Dict, pth_path: str, backbone: str
) -> Dict:
    """Load any supported backbone .pth (upstream naming, see module
    docstring) from disk and graft it as the encoder."""
    import torch

    state_dict = torch.load(pth_path, map_location="cpu", weights_only=True)
    if "state_dict" in state_dict:
        state_dict = state_dict["state_dict"]
    params, stats = convert_backbone(backbone, state_dict)
    # Fail loudly on depth/width mismatches: grafting an encoder whose
    # shapes differ from the model's would only surface later as an
    # opaque jit or checkpoint-restore error.
    assert_tree_shapes_match(variables["params"]["encoder"], params, "params")
    if "encoder" in variables.get("batch_stats", {}):
        assert_tree_shapes_match(
            variables["batch_stats"]["encoder"], stats, "batch_stats"
        )
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
