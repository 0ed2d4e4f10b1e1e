from zs3_tpu.utils.losses import cross_entropy_loss, focal_loss, build_seg_loss
from zs3_tpu.utils.schedules import build_schedule

__all__ = ["cross_entropy_loss", "focal_loss", "build_seg_loss", "build_schedule"]
