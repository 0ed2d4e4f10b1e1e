"""Fused classify + bilinear-upsample Pallas tail (logits path).

** MEASURED NEGATIVE RESULT — kept flag-off as evidence (DESIGN.md §4,
"sixth fix"). ** 585.5 img/s at B128 vs 701.5 for the XLA tail: any
kernel that materializes NHWC logits writes 9.3 GB of T(8,128)
lane-padded tiles for the logical 1.4 GB (the 21-class minor dim pads
to 128), ≈15.5 ms — alone more than the entire 15.6 ms XLA tail, which
folds the resize into the consuming reduction and never materializes
the logits; and the pallas operand's default-layout pin perturbs the
trunk's layout assignment (22 GB of relayout loop-fusions naive,
4.7 GB + 2.6 GB formatting even behind the bitcast adaptor below).

Why it was built (VERDICT r4 weak #2): in the compiled float forward,
XLA back-propagates batch-minor layouts from the resize-as-dot
consumers into the 1×1 classifier conv, which then runs at 1.7 TF/s
(13.4 ms at B128 vs 4.9 ms standalone).  Five in-XLA fixes measured
slower (optimization_barrier, gather resize, channels-major einsums,
phase-lerp resize, two-program split); this kernel was the one
mechanism avoiding both the in-program layout assignment and a program
boundary, and closes the residual by measurement.

Semantics: `classify_resize(feats, w, b, size)` ==
`resize_bilinear(feats @ w + b, size, align_corners=True)` for the
exact-4× case `size = (4·(H−1)+1, 4·(W−1)+1)` — the DeepLab os4 → input
geometry (crop 513 → 129-grid features; reference semantics
F.interpolate(..., align_corners=True), zs3/modeling/deeplab.py per
SURVEY.md §2.2).  Classify and resize commute (both linear, and the
interpolation matrix is row-stochastic so the bias passes through
exactly); classifying FIRST at the small grid is 16× cheaper.

Kernel layout strategy (all shapes per grid step, grid = (B, H-tiles)):
  * the kernel reads the features through a LAYOUT ADAPTOR: the trunk's
    convs naturally carry layout {3,0,2,1} (physical order H, W, B, C —
    measured in the compiled B128 HLO), and a pallas operand pins the
    DEFAULT layout for its logical shape.  Feeding the (B,H,W,C) array
    directly made XLA re-assign layouts through the whole trunk (22 GB
    of relayout loop-fusions + ~9 ms slower convs, measured — the
    "ripple").  `transpose(1,2,0,3).reshape(H, W, B·C)` is a pure
    BITCAST of the {3,0,2,1} buffer, so the pallas pin is satisfied at
    zero cost and nothing propagates upstream;
  * source rows for an out-row tile of TH=32 are the 8-row band
    [8t, 8t+8] — block-aligned via an (8, W, C) input block plus a
    separate 1-row halo block of the SAME array (two in_specs, two
    index maps; Pallas block offsets must be block-aligned so an
    overlapping 9-row window is not directly expressible);
  * classify: 9 MXU dots (W, C) @ (C, K) with f32 accumulation;
  * H-resize: exact-4× align-corners weights are STATIC per phase
    (out row 4q+p = (1−p/4)·L[q] + (p/4)·L[q+1]), so each out row is
    at most one scalar-weighted VPU FMA of two logits rows — no
    interpolation-matrix operand and no 9-tap zero-multiply chain;
  * W-resize: out rows are packed ⌊128/K⌋-at-a-time along the lane dim
    so the (WO, WI) @ (WI, pack·K) MXU dot runs near-full lanes instead
    of 21/128 occupancy, then unpacked into the NHWC out block whose
    (WO, K) slices match the store layout exactly.

The LAST row tile is partial and clamped (513 = 16·32 + 1): its single
valid out row (4·(HI−1), e.g. 512) maps exactly onto the final source
row with weight 1.0, which the halo block always holds — one traced
select on row 0 handles it; the tile's other 31 rows are out of range
and masked by Pallas.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zs3_tpu.ops.resize import _linear_matrix_np, resize_bilinear

_TH = 32          # output rows per grid step
_SRC = _TH // 4   # source rows per grid step (exact-4× upsample)


def supported(
    in_hw: Tuple[int, int], out_hw: Tuple[int, int], num_classes: int
) -> bool:
    """True when the fused tail's geometry contract holds: exact 4×
    align-corners upsample on both axes, source rows divisible into
    8-row bands, and the packed W-dot fits the lane width."""
    (h, w), (oh, ow) = in_hw, out_hw
    return (
        oh == 4 * (h - 1) + 1
        and ow == 4 * (w - 1) + 1
        and (h - 1) % _SRC == 0
        and h > _SRC
        and 1 <= num_classes <= 128
    )


def _kernel(ww_ref, wcls_ref, bias_ref, feat_ref, halo_ref, out_ref, *,
            num_classes, pack, acc_dtype, n_src_blocks):
    k = num_classes
    # f32 models would need HIGHEST like the oracle's einsums — the
    # MXU's DEFAULT precision truncates f32 operands to bf16 (measured
    # 2.3e-3 rel err on TPU even with precision=HIGHEST requested, so
    # the dispatcher gates the TPU path to bf16); interpret-mode f32
    # tests are exact either way.
    prec = (
        jax.lax.Precision.HIGHEST
        if acc_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    wcls = wcls_ref[...]                       # (C, K)
    bias = bias_ref[...].astype(jnp.float32)   # (1, K)
    # classify each source row on the MXU, f32 accumulation
    logits = []
    for j in range(_SRC + 1):
        row = feat_ref[j] if j < _SRC else halo_ref[0]         # (WI, C)
        lj = jax.lax.dot_general(
            row, wcls, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        logits.append(lj + bias)               # (WI, K) f32
    # The clamped last tile: its only valid out row (4·(HI−1)) has
    # weight 1.0 on the final source row, which the halo always holds.
    # Every other row of that tile is out of range and masked by
    # Pallas, so one select on row 0 is the whole special case.
    clamped = pl.program_id(1) >= n_src_blocks
    # H-resize, static exact-4× phase weights: out row 4q+p =
    # (1−p/4)·L[q] + (p/4)·L[q+1]; p=0 rows are pure copies.
    rows = []
    for r in range(_TH):
        q, p = divmod(r, 4)
        if p == 0:
            rows.append(logits[q])
        else:
            a = jnp.float32(1.0 - p / 4.0)
            b = jnp.float32(p / 4.0)
            rows.append(a * logits[q] + b * logits[q + 1])
    rows[0] = jnp.where(clamped, logits[_SRC], rows[0])
    # W-resize: pack `pack` out-rows along lanes per MXU dot
    ww = ww_ref[...]                            # (WO, WI)
    for g in range(-(-_TH // pack)):
        idx = list(range(g * pack, min((g + 1) * pack, _TH)))
        parts = [rows[r].astype(acc_dtype) for r in idx]
        rhs = parts[0] if len(parts) == 1 else jnp.concatenate(
            parts, axis=1
        )                                       # (WI, n·K)
        res = jax.lax.dot_general(
            ww, rhs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )                                       # (WO, n·K) f32
        for i, r in enumerate(idx):
            out_ref[0, r] = res[:, i * k : (i + 1) * k].astype(
                out_ref.dtype
            )


def classify_resize_fused(
    feats: jax.Array,
    w: jax.Array,
    b: jax.Array,
    size: Tuple[int, int],
    interpret: bool = False,
) -> jax.Array:
    """(B, H, W, C) features → (B, 4(H−1)+1, 4(W−1)+1, K) logits via the
    fused Pallas tail.  w: (C, K) classifier weights, b: (K,) bias.
    Output dtype follows `feats` (the model casts f32 at its boundary,
    like the XLA tail)."""
    bsz, hi, wi, c = feats.shape
    ho, wo = size
    k = w.shape[-1]
    assert supported((hi, wi), (ho, wo), k), (feats.shape, size, k)
    acc_dtype = feats.dtype
    ww = jnp.asarray(
        _linear_matrix_np(wi, wo, True), dtype=acc_dtype
    )                                                        # (WO, WI)
    wcls = w.astype(feats.dtype)
    bias = b.reshape(1, k).astype(jnp.float32)
    pack = max(1, 128 // k)
    grid = (bsz, pl.cdiv(ho, _TH))
    n_src_blocks = (hi - 1) // _SRC
    # Layout adaptor (see module docstring): a pure bitcast of the
    # trunk's natural {3,0,2,1} buffer into a default-layout 3D view,
    # so the pallas operand pin cannot ripple layouts into the trunk.
    feats_v = jnp.transpose(feats, (1, 2, 0, 3)).reshape(hi, wi, bsz * c)
    return pl.pallas_call(
        functools.partial(
            _kernel, num_classes=k, pack=pack, acc_dtype=acc_dtype,
            n_src_blocks=n_src_blocks,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((wo, wi), lambda bt, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, k), lambda bt, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda bt, t: (0, 0),
                         memory_space=pltpu.VMEM),
            # 8-row source band, clamped so the last (partial) out tile
            # reuses the final in-range band (index maps get traced
            # scalars: jnp.minimum, not python min); dim2 of the 3D
            # view is B·C with block C, so block index = batch index
            pl.BlockSpec(
                (_SRC, wi, c),
                lambda bt, t: (jnp.minimum(t, n_src_blocks - 1), 0, bt),
                memory_space=pltpu.VMEM,
            ),
            # 1-row halo (same array, 1-row blocks are always aligned)
            pl.BlockSpec(
                (1, wi, c),
                lambda bt, t: (
                    jnp.minimum(_SRC * t + _SRC, hi - 1), 0, bt
                ),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, _TH, wo, k), lambda bt, t: (bt, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, ho, wo, k), feats.dtype),
        interpret=interpret,
    )(ww, wcls, bias, feats_v, feats_v)


def classify_resize(
    feats: jax.Array, w: jax.Array, b: jax.Array, size: Tuple[int, int]
) -> jax.Array:
    """Dispatch: fused Pallas tail on TPU when the geometry contract
    holds AND features are bf16 (the serving dtype); jnp oracle
    elsewhere (identical semantics).  f32 models keep the XLA tail:
    Mosaic's dot lowering does not honor HIGHEST precision (measured
    2.4e-3 rel err vs the f32 oracle on TPU — bf16-grain, with
    precision=HIGHEST requested), and f32 configs exist for golden
    parity where that drift is unacceptable.  No VJP — this is the
    inference/serving tail; training keeps the XLA tail."""
    k = w.shape[-1]
    if (
        jax.default_backend() == "tpu"
        and feats.dtype == jnp.bfloat16
        # Mosaic lowering: the feature block's last dim must be a
        # multiple of the 128-lane width (true for the 256-d ZS3
        # feature tap; tiny test configs take the oracle)
        and feats.shape[-1] % 128 == 0
        and supported(feats.shape[1:3], size, k)
    ):
        return classify_resize_fused(feats, w, b, size)
    logits = feats @ w.astype(feats.dtype) + b.astype(feats.dtype)
    return resize_bilinear(logits, size, align_corners=True)
