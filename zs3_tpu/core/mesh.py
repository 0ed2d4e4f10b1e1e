"""Device mesh and sharding helpers.

The reference's only parallelism is single-process torch DataParallel plus
a thread-queue SyncBN (reference: zs3/modeling/sync_batchnorm/comm.py
SyncMaster/SlavePipe).  The TPU-native equivalent is a ``jax.sharding.Mesh``
with NamedSharding: batches are sharded over the ``data`` axis, parameters
are replicated, and XLA inserts the gradient all-reduce / BN-stat pmean as
ICI collectives.  The mesh spec is open-ended so a later ``space`` axis
(spatial sharding of the HxW grid) or a 2-level (ici, dcn) layout slots in
without touching call sites.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axes: Sequence[Tuple[str, int]] = (("data", -1),),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh from (axis_name, size) pairs; size -1 absorbs the rest."""
    devices = list(devices if devices is not None else jax.devices())
    names = [name for name, _ in axes]
    sizes = [size for _, size in axes]
    n_wild = sum(1 for s in sizes if s == -1)
    if n_wild > 1:
        raise ValueError("at most one mesh axis may have size -1")
    fixed = math.prod(s for s in sizes if s != -1)
    if n_wild:
        if len(devices) % fixed:
            raise ValueError(
                f"{len(devices)} devices not divisible by fixed axes product {fixed}"
            )
        sizes = [len(devices) // fixed if s == -1 else s for s in sizes]
    total = math.prod(sizes)
    if total > len(devices):
        raise ValueError(f"mesh wants {total} devices, have {len(devices)}")
    grid = np.array(devices[:total]).reshape(sizes)
    return Mesh(grid, axis_names=tuple(names))


def batch_sharding(mesh: Mesh, axis="data") -> NamedSharding:
    """Shard the leading (batch) dimension over one or more mesh axes.

    `axis` may be a single name or a tuple of names — passing
    ``("dcn", "data")`` shards the batch over the product of a slow
    (cross-host DCN) and a fast (ICI) axis, the standard multi-pod
    data-parallel layout.  XLA then emits the gradient all-reduce as a
    two-level reduction (intra-ICI ring, then cross-DCN), nothing else
    in the train step changes — see tests/test_mesh.py::
    test_two_level_dcn_data_mesh_trains (SURVEY.md §5 "2-level (ici,
    dcn) axis spec")."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis="data"):
    """Place a pytree of host arrays with the batch dim sharded over
    `axis` (a mesh-axis name or tuple of names)."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def prefetch_to_device(iterator, mesh: Mesh, depth: int = 2, axis: str = "data"):
    """Shard-and-transfer batches `depth` ahead of consumption.

    device_put is asynchronous, so enqueueing the next batches while the
    current step computes overlaps host->device transfer with compute
    (the torch-DataLoader pin_memory+prefetch analog, but driven by
    XLA's async dispatch instead of worker processes).
    """
    import collections

    queue = collections.deque()
    for batch in iterator:
        queue.append(shard_batch(batch, mesh, axis))
        if len(queue) > depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def pad_eval_batch(batch: dict, multiple: int, ignore_index: int = 255) -> dict:
    """Pad batch dim to a multiple of the mesh axis with inert samples.

    Padded rows get all-`ignore_index` labels, so confusion-matrix /
    masked-loss consumers are unaffected.  Keeps eval shapes static per
    (dataset_size % batch) remainder without constraining eval batch
    size to the device count.
    """
    import numpy as np

    n = next(iter(batch.values())).shape[0]
    target = pad_to_multiple(n, multiple)
    if target == n:
        return batch
    pad = target - n
    out = {}
    for key, value in batch.items():
        widths = [(0, pad)] + [(0, 0)] * (value.ndim - 1)
        fill = ignore_index if key == "label" else 0
        out[key] = np.pad(np.asarray(value), widths, constant_values=fill)
    return out


def device_batch(batch, mesh: Mesh, ignore_index: int, eval: bool = False):
    """Validate + shard one host batch onto the mesh.

    Single source of the trainers' batch plumbing (train batches must
    divide the data axis; eval batches are padded with inert samples).
    """
    batch = {"image": batch["image"], "label": batch["label"]}
    n_data = mesh.shape.get("data", 1)
    if eval:
        batch = pad_eval_batch(batch, n_data, ignore_index)
    elif batch["image"].shape[0] % n_data:
        raise ValueError(
            f"train batch size {batch['image'].shape[0]} must be divisible "
            f"by the data mesh axis ({n_data})"
        )
    return shard_batch(batch, mesh)


def bounded_train_batches(loader, mesh: Mesh, max_steps: int):
    """Host batches for one epoch, validated, capped at max_steps."""
    n_data = mesh.shape.get("data", 1)
    for i, batch in enumerate(loader):
        if i >= max_steps:
            break
        if batch["image"].shape[0] % n_data:
            raise ValueError(
                f"train batch size {batch['image'].shape[0]} must be "
                f"divisible by the data mesh axis ({n_data})"
            )
        yield {"image": batch["image"], "label": batch["label"]}
