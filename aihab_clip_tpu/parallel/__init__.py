from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
    shard_params,
)
from .pipeline import (
    STAGE_AXIS,
    make_pipeline_mesh,
    pipeline_encode,
    place_stage_params,
    stack_stage_params,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "STAGE_AXIS",
    "batch_sharding",
    "make_mesh",
    "make_pipeline_mesh",
    "param_shardings",
    "pipeline_encode",
    "place_stage_params",
    "replicated",
    "shard_batch",
    "shard_params",
    "stack_stage_params",
]
