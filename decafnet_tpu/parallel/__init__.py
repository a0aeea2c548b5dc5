from .mesh import (
    init_distributed,
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)

__all__ = [
    "init_distributed",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
]
