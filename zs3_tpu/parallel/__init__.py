from zs3_tpu.parallel.spatial import (
    spatial_batch_sharding,
    spatially_sharded_forward,
)

__all__ = ["spatial_batch_sharding", "spatially_sharded_forward"]
