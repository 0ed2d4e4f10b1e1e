from zs3_tpu.core.config import (
    Config,
    DataConfig,
    GMMNConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from zs3_tpu.core.mesh import make_mesh, batch_sharding, replicated_sharding

__all__ = [
    "Config",
    "DataConfig",
    "GMMNConfig",
    "ModelConfig",
    "OptimConfig",
    "TrainConfig",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
]
