"""Spatial sharding — the segmentation analog of sequence parallelism.

The reference has no sequence/context parallelism (SURVEY.md §2.5: CNN,
no attention); its "long-input" axis is spatial resolution.  When one
image no longer fits a chip (e.g. >>513² inference), the TPU-native
answer is to shard the H dimension of NHWC activations over a `space`
mesh axis.  Crucially we do NOT hand-write halo exchanges: convolutions
under jit with sharded spatial inputs are partitioned by XLA's SPMD
partitioner, which inserts the boundary collective-permutes itself —
including for strided, dilated (atrous) and depthwise convs, where
manual halo widths would be error-prone (dilation-8 multigrid needs an
8-pixel halo; XLA derives that from the op).

This module provides the sharding layouts plus a jit-wrapped forward
with (data, space)-sharded inputs; `__graft_entry__.dryrun_multichip`
exercises it on a (data x space) mesh alongside the data-parallel train
step.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spatial_batch_sharding(
    mesh: Mesh, data_axis: Optional[str] = "data", space_axis: str = "space"
) -> NamedSharding:
    """NHWC batches: batch over `data`, H over `space`."""
    data = data_axis if data_axis in mesh.shape else None
    space = space_axis if space_axis in mesh.shape else None
    return NamedSharding(mesh, P(data, space, None, None))


def spatially_sharded_forward(
    model,
    mesh: Mesh,
    data_axis: Optional[str] = "data",
    space_axis: str = "space",
    method: Optional[str] = None,
):
    """jit forward with H sharded over `space` (and batch over `data`).

    Parameters replicate; the output keeps the input layout.  XLA
    partitions every conv/pool/resize and inserts halo exchanges over
    ICI.  Inputs' H must be divisible by the `space` axis size.
    """
    x_sharding = spatial_batch_sharding(mesh, data_axis, space_axis)
    rep = NamedSharding(mesh, P())

    kwargs = {} if method is None else {"method": method}

    def fwd(variables, x):
        return model.apply(variables, x, train=False, **kwargs)

    return jax.jit(
        fwd,
        in_shardings=(rep, x_sharding),
        out_shardings=x_sharding,
    )


def spatially_sharded_train_step(
    loss_fn,
    mesh: Mesh,
    data_axis: Optional[str] = "data",
    space_axis: str = "space",
    donate: bool = False,
    device_preprocess: bool = False,
    loss_at: str = "full",
):
    """Supervised train step with batches sharded (batch over `data`,
    H over `space`) — resolution scale-out TRAINING, not just inference.

    The backward pass's conv-gradient halo exchanges are XLA-inserted
    exactly like the forward's; gradients and BN statistics reduce over
    both mesh axes (global-batch semantics), so numerics match the
    single-device step up to reduction order
    (tests/test_spatial.py::test_spatial_train_step*).
    """
    from zs3_tpu.train.seen import make_train_step

    x_sh = spatial_batch_sharding(mesh, data_axis, space_axis)
    lbl_sh = NamedSharding(
        mesh,
        P(
            data_axis if data_axis in mesh.shape else None,
            space_axis if space_axis in mesh.shape else None,
            None,
        ),
    )
    rep = NamedSharding(mesh, P())
    return make_train_step(
        loss_fn,
        donate=donate,
        device_preprocess=device_preprocess,
        loss_at=loss_at,
        in_shardings=(rep, {"image": x_sh, "label": lbl_sh}, rep),
    )
