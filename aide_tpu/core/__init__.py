from aide_tpu.core.config import (  # noqa: F401
    TrainConfig,
    ModelConfig,
    DataConfig,
    OptimConfig,
    CoteachConfig,
    EvalConfig,
    MeshConfig,
)
from aide_tpu.core.mesh import make_mesh, batch_sharding, shard_batch  # noqa: F401
from aide_tpu.core.registry import MODELS, TASKS, LOSSES  # noqa: F401
