from zs3_tpu.metrics.evaluator import Evaluator, iou_from_confusion

__all__ = ["Evaluator", "iou_from_confusion"]
