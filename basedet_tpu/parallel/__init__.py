from .mesh import (
    batch_sharding,
    local_world_size,
    make_mesh,
    replicate_state,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "local_world_size",
    "make_mesh",
    "replicate_state",
    "replicated",
    "shard_batch",
]
