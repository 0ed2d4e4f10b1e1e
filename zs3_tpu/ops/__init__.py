from zs3_tpu.ops.resize import resize_bilinear, resize_nearest
from zs3_tpu.ops.confusion import confusion_matrix
from zs3_tpu.ops.mmd import mmd_loss, pairwise_sq_dists

__all__ = [
    "resize_bilinear",
    "resize_nearest",
    "confusion_matrix",
    "mmd_loss",
    "pairwise_sq_dists",
]
