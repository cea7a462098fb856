from .mesh import (
    batch_sharding,
    combined_state_sharding,
    fsdp_state_sharding,
    get_data_mesh,
    maybe_init_distributed,
    replicated_sharding,
    shard_batch,
    tp_state_sharding,
)

__all__ = [
    "batch_sharding",
    "combined_state_sharding",
    "fsdp_state_sharding",
    "get_data_mesh",
    "maybe_init_distributed",
    "replicated_sharding",
    "shard_batch",
    "tp_state_sharding",
]
