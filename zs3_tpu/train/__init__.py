from zs3_tpu.train.state import SegTrainState, create_seg_state

__all__ = ["SegTrainState", "create_seg_state"]
