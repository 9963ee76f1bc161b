from .mesh import (
    DATA_AXIS,
    barrier,
    batch_sharding,
    local_batch_to_global,
    make_mesh,
    replicate,
    replicate_global,
    replicated,
    shard_batch,
)
from .distributed import setup_distributed, finalize_distributed
from .spatial import (
    SPACE_AXIS,
    make_mesh_2d,
    shard_batch_spatial,
    spatial_sharding,
)
from .pipeline import DEFAULT_PARTITION, PipelinedModel
from .sync_bn import LocalBatchNorm
from .tensor import (
    TENSOR_AXIS,
    make_mesh_3d,
    shard_state_tensor,
    tensor_spec,
)

__all__ = [
    "DATA_AXIS",
    "barrier",
    "batch_sharding",
    "local_batch_to_global",
    "make_mesh",
    "replicate",
    "replicate_global",
    "replicated",
    "shard_batch",
    "SPACE_AXIS",
    "make_mesh_2d",
    "shard_batch_spatial",
    "spatial_sharding",
    "setup_distributed",
    "finalize_distributed",
    "LocalBatchNorm",
    "DEFAULT_PARTITION",
    "PipelinedModel",
    "TENSOR_AXIS",
    "make_mesh_3d",
    "shard_state_tensor",
    "tensor_spec",
]
