from .mesh import (create_mesh, batch_sharding, maybe_initialize_distributed,
                   replicated_sharding, shard_batch, local_process_info)

__all__ = ["create_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch", "local_process_info",
           "maybe_initialize_distributed"]
