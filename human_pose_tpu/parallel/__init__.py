from .mesh import (
    DATA_AXIS,
    barrier,
    batch_sharding,
    local_batch_to_global,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from .distributed import setup_distributed, finalize_distributed
from .sync_bn import LocalBatchNorm

__all__ = [
    "DATA_AXIS",
    "barrier",
    "batch_sharding",
    "local_batch_to_global",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_batch",
    "setup_distributed",
    "finalize_distributed",
    "LocalBatchNorm",
]
