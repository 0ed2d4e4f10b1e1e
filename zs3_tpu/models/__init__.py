from zs3_tpu.models.deeplab import DeepLab, build_deeplab
from zs3_tpu.models.gmmn import GMMNGenerator, GraphContextGMMN

__all__ = ["DeepLab", "build_deeplab", "GMMNGenerator", "GraphContextGMMN"]
