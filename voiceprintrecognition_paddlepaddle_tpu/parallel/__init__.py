from .mesh import (create_mesh, batch_sharding, maybe_initialize_distributed,
                   replicated_sharding, shard_batch, local_process_info,
                   allgather_ragged)

__all__ = ["create_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch", "local_process_info", "allgather_ragged",
           "maybe_initialize_distributed"]
