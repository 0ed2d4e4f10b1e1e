"""Post-training int8 quantization for the inference path.

The reference has no quantization story (torch fp32 inference
throughout); this is a TPU-native extension: the v5e MXU executes
s8 x s8 -> s32 at roughly twice the bf16 rate (measured on this chip:
309 vs 147 TF/s on chained 8192^3 matmuls, 168 vs 116 on a chained
3x3x256 conv), and int8 activations quarter the HBM traffic into each
conv.  Standard PTQ recipe:

  * per-OUTPUT-CHANNEL symmetric weight scales, computed in-trace from
    the float kernel (absmax/127 — negligible next to the conv, and it
    keeps the float checkpoint the single source of truth: no second
    param tree to version or convert);
  * per-TENSOR symmetric activation scales from absmax calibration:
    run a few representative batches through the float model with a
    flax method interceptor that `sow`s each conv input's |x|_max
    (jit-compatible: reduce_fn=maximum), then freeze absmax/127;
  * the stem (7x7, 3 input channels — lane-starved, no MXU win) and
    the logits-producing classifier convs stay float; everything
    between quantizes.

Activation: how it runs
  `scale_for(path)` consults a contextvar set by `quantized(scales)`.
  models.layers._ConvImpl calls it AT TRACE TIME — so the `quantized`
  context must wrap the jit TRACE, not (only) the call.  Predictor and
  export own their jit caches and re-trace inside the context; using
  the context around an already-traced function silently runs float
  (documented footgun — prefer the Predictor/export surfaces).

Accuracy contract: argmax-agreement and mIoU-delta bars live in
tests/test_quant.py; the serving/eval surfaces expose this as
`--int8 [--calib-images ...] [--int8-percentile P]`.
"""

from __future__ import annotations

import contextlib
import contextvars
import json
from typing import Any, Callable, Dict, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PathKey = Tuple[str, ...]

_ACTIVE: contextvars.ContextVar[Optional[Dict[PathKey, float]]] = (
    contextvars.ContextVar("zs3_quant_scales", default=None)
)

_QAT: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "zs3_qat", default=False
)

# Paths containing any of these substrings never quantize: the
# classifier conv emits the logits the zero-shot pipeline retrains and
# compares in f32.  (Depthwise/grouped convs fall back to float via the
# feature_group_count guard in models/layers._ConvImpl.)
DEFAULT_EXCLUDE: Tuple[str, ...] = ("classifier",)

# Convs with fewer input channels than this stay float: a 3-channel
# stem (drn/mobilenet/xception route theirs through the Conv wrapper;
# resnet's StemConv bypasses it) is lane-starved on the MXU — no int8
# win — and the first layer is the most accuracy-sensitive.  Enforced
# in BOTH calibrate() (never recorded) and _ConvImpl (never lowered,
# even under hand-written scales).
MIN_QUANT_IN_CH = 16


def scale_for(path: Sequence[str]) -> Optional[float]:
    """Activation absmax for a conv module path, if quantization is
    active and this conv was calibrated (None -> run float)."""
    scales = _ACTIVE.get()
    if not scales:
        return None
    return scales.get(tuple(path))


@contextlib.contextmanager
def quantized(scales: Dict[Any, float]):
    """Activate int8 conv lowering for convs present in `scales`.

    Keys may be path tuples or 'a/b/c' strings; values are calibrated
    input ABSMAX (not the scale itself).  Must wrap jit tracing.

    DEFAULT_EXCLUDE is enforced HERE as well as in calibrate(): a
    hand-written or scales_from_json-loaded dict containing a
    'classifier' path is dropped at context entry, so the
    logits-producing conv can never run s8 regardless of where the
    scales came from.
    """
    norm: Dict[PathKey, float] = {}
    for k, v in scales.items():
        key = tuple(k.split("/")) if isinstance(k, str) else tuple(k)
        if path_excluded(key):
            continue
        norm[key] = float(v)
    token = _ACTIVE.set(norm)
    try:
        yield
    finally:
        _ACTIVE.reset(token)


@contextlib.contextmanager
def qat():
    """Enable quantization-aware training while tracing a train step.

    Inside this context every quantization-eligible conv (same
    eligibility as PTQ: ungrouped, >= MIN_QUANT_IN_CH input channels,
    path not excluded) runs on FAKE-QUANTIZED operands — both the input
    and the kernel are rounded onto the int8 grid and dequantized, with
    straight-through gradients — so the weights learn to sit well on
    the grid the deployed int8_conv will snap them to.  Like
    quantized(), this is a TRACE-time switch: enter it inside (or
    around) the traced function body, e.g. the train step's loss fn
    (train/seen.py wires `TrainConfig.qat` this way).
    """
    token = _QAT.set(True)
    try:
        yield
    finally:
        _QAT.reset(token)


def qat_active() -> bool:
    return _QAT.get()


def path_excluded(
    path: Sequence[str], exclude: Sequence[str] = DEFAULT_EXCLUDE
) -> bool:
    """True if the module path's 'a/b/c' form contains an exclude
    substring (same rule filter_excluded applies to calibrations)."""
    joined = "/".join(path)
    return any(sub in joined for sub in exclude)


def fake_quant_conv_operands(
    x: jax.Array,
    kernel: jax.Array,
    act_absmax: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Quantize-dequantize conv operands onto the int8 grid (QAT).

    Activation: per-tensor symmetric; the scale comes from `act_absmax`
    when given (calibrated QAT) else the batch's own |x| max (dynamic
    QAT, the training default — nothing saturates, so the only training
    signal is the rounding).  Kernel: per-output-channel symmetric —
    exactly the grid int8_conv snaps to at deployment.  The grid math
    runs in f32 so grid points are exact regardless of compute dtype,
    and gradients pass straight through both roundings
    (y = x + stop_grad(q(x) - x)), the standard STE.
    """
    xf = x.astype(jnp.float32)
    amax = (
        jax.lax.stop_gradient(jnp.max(jnp.abs(xf)))
        if act_absmax is None
        else jnp.float32(act_absmax)
    )
    s_act = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / s_act), -127.0, 127.0) * s_act
    x_fq = (xf + jax.lax.stop_gradient(xq - xf)).astype(x.dtype)

    kf = kernel.astype(jnp.float32)
    w_absmax = jax.lax.stop_gradient(
        jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)), 1e-8)
    )
    s_w = w_absmax / 127.0
    wq = jnp.clip(jnp.round(kf / s_w), -127.0, 127.0) * s_w
    w_fq = (kf + jax.lax.stop_gradient(wq - kf)).astype(kernel.dtype)
    return x_fq, w_fq


def int8_conv(
    x: jax.Array,
    kernel: jax.Array,
    act_absmax: float,
    strides: Tuple[int, int],
    padding: Tuple[Tuple[int, int], Tuple[int, int]],
    rhs_dilation: Tuple[int, int],
    out_dtype,
) -> jax.Array:
    """s8 x s8 -> s32 conv with symmetric per-channel dequant.

    x quantizes per-tensor against the calibrated absmax (values beyond
    it saturate at +-127 — absmax calibration makes clipping rare by
    construction); the kernel quantizes per-output-channel in-trace.
    Accumulation is exact int32; the only approximation is the two
    roundings.  Output returns in `out_dtype` (the model's compute
    dtype) so downstream BN/ReLU fuse as usual.
    """
    s_act = jnp.float32(max(act_absmax, 1e-8) / 127.0)
    w_absmax = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-8)
    s_w = w_absmax / 127.0  # (O,)
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / s_act), -127.0, 127.0
    ).astype(jnp.int8)
    wq = jnp.clip(jnp.round(kernel / s_w), -127.0, 127.0).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq,
        wq,
        strides,
        padding,
        rhs_dilation=rhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * (s_act * s_w)).astype(out_dtype)


def _conv_interceptor(percentile: Optional[float]):
    from zs3_tpu.models.layers import _ConvImpl

    def interceptor(next_fn, args, kwargs, context):
        mod = context.module
        if (
            isinstance(mod, _ConvImpl)
            and context.method_name == "__call__"
            and mod.feature_group_count == 1
            and args[0].shape[-1] >= MIN_QUANT_IN_CH
        ):
            mag = jnp.abs(args[0].astype(jnp.float32))
            stat = (
                jnp.max(mag)
                if percentile is None
                # per-batch percentile, maxed across batches — clips
                # activation outliers so the bulk of the range keeps
                # its 8-bit resolution (values beyond saturate at 127)
                else jnp.percentile(mag.reshape(-1), percentile)
            )
            mod.sow(
                "quant_stats",
                "in_absmax",
                stat,
                reduce_fn=jnp.maximum,
                init_fn=lambda: jnp.float32(0.0),
            )
        return next_fn(*args, **kwargs)

    return interceptor


def calibrate(
    apply_fn: Callable[..., Any],
    variables: Dict[str, Any],
    batches: Iterable[np.ndarray],
    *,
    exclude: Sequence[str] = DEFAULT_EXCLUDE,
    apply_kwargs: Optional[Dict[str, Any]] = None,
    percentile: Optional[float] = None,
) -> Dict[PathKey, float]:
    """Run `batches` through the float model, return conv-input absmax.

    apply_fn(variables, batch, mutable=..., **apply_kwargs) must be a
    flax apply (Predictor passes the model's); the interceptor sows
    each conv input's absmax under a side collection, so the whole
    forward stays ONE jit program per batch shape.  Returns
    {conv module path: absmax} with `exclude` substrings dropped.

    `percentile` (e.g. 99.99) calibrates each conv to that percentile
    of |input| instead of the max: activation outliers saturate at
    +-127 while the bulk of the distribution keeps its 8-bit
    resolution — the standard PTQ accuracy knob when absmax is
    outlier-inflated.
    """
    import flax.linen as nn
    from flax import traverse_util

    apply_kwargs = dict(apply_kwargs or {})
    absmax: Dict[PathKey, float] = {}

    @jax.jit
    def run(v, x):
        with nn.intercept_methods(_conv_interceptor(percentile)):
            _, stats = apply_fn(
                v, x, mutable=["quant_stats"], **apply_kwargs
            )
        # empty when every conv is excluded structurally (grouped or
        # lane-starved) — a legal, if pointless, calibration
        return stats.get("quant_stats", {})

    for batch in batches:
        stats = jax.device_get(run(variables, jnp.asarray(batch)))
        flat = traverse_util.flatten_dict(stats)
        for key, value in flat.items():
            # sow appends a tuple; reduce_fn=maximum keeps it length-1
            path = tuple(key[:-1])
            v = float(value[0]) if isinstance(value, tuple) else float(value)
            absmax[path] = max(absmax.get(path, 0.0), v)
    return filter_excluded(absmax, exclude)


def filter_excluded(
    scales: Dict[PathKey, float], exclude: Sequence[str]
) -> Dict[PathKey, float]:
    """Drop every path whose 'a/b/c' form contains an exclude substring."""
    return {
        p: v
        for p, v in scales.items()
        if not any(sub in "/".join(p) for sub in exclude)
    }


def calibrate_from_batches(
    apply_fn: Callable[..., Any],
    variables: Dict[str, Any],
    batch_iter: Iterable[np.ndarray],
    *,
    n_batches: int = 2,
    apply_kwargs: Optional[Dict[str, Any]] = None,
    percentile: Optional[float] = None,
) -> Dict[PathKey, float]:
    """calibrate() on the first `n_batches` drawn from `batch_iter`.

    Shared by the trainers' --int8 eval paths (SeenTrainer and
    GMMNTrainer pull their first val batches through this) so the
    batch-budget and iteration logic live in one place."""
    import itertools

    batches = list(itertools.islice(iter(batch_iter), n_batches))
    if not batches:
        raise ValueError("int8 calibration: loader yielded no batches")
    return calibrate(
        apply_fn,
        variables,
        batches,
        apply_kwargs=apply_kwargs,
        percentile=percentile,
    )


def default_conv_scales(
    params: Dict[str, Any],
    absmax: float = 6.0,
    exclude: Sequence[str] = DEFAULT_EXCLUDE,
) -> Dict[PathKey, float]:
    """Fake calibration: every quantizable conv path -> constant absmax.

    For throughput benchmarks and compile checks where scale VALUES are
    irrelevant (bench.py, __graft_entry__.py): walks a param tree (real
    arrays or eval_shape ShapeDtypeStructs), finds conv kernels at the
    `.../conv/kernel` position `_ConvImpl` creates, and applies the SAME
    eligibility rules as the real pipeline — `path_excluded` (substring
    on the joined path, the rule `quantized()` re-enforces at context
    entry) and the MIN_QUANT_IN_CH lane-starvation floor, read off the
    kernel's HWIO input-channel dim.  Grouped convs can't be detected
    from shapes alone; `_ConvImpl` refuses them at trace time anyway.

    This is THE one source of the exclude rule for synthetic scales: a
    module rename that breaks the substring match changes the set here,
    in the bench, and in the dryrun at once (tests/test_quant.py pins
    the classifier exclusion).
    """
    from flax import traverse_util

    leaves = traverse_util.flatten_dict(params)
    scales: Dict[PathKey, float] = {}
    for key, leaf in leaves.items():
        if key[-2:] != ("conv", "kernel"):
            continue
        shape = getattr(leaf, "shape", None)
        if shape is None or len(shape) != 4 or shape[2] < MIN_QUANT_IN_CH:
            continue
        path = tuple(key[:-1])
        if path_excluded(path, exclude):
            continue
        scales[path] = float(absmax)
    return scales


def scales_to_json(scales: Dict[PathKey, float]) -> str:
    return json.dumps(
        {"/".join(p): v for p, v in sorted(scales.items())}, indent=1
    )


def scales_from_json(text: str) -> Dict[PathKey, float]:
    return {tuple(k.split("/")): float(v) for k, v in json.loads(text).items()}
