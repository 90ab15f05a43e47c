from .mesh import (
    batch_sharding,
    local_world_size,
    make_mesh,
    replicate_state,
    replicated,
    shard_batch,
)
from .tp import current_tp_mesh, tp_context, tp_shard, tp_size

__all__ = [
    "batch_sharding",
    "current_tp_mesh",
    "local_world_size",
    "make_mesh",
    "replicate_state",
    "replicated",
    "shard_batch",
    "tp_context",
    "tp_shard",
    "tp_size",
]
