from .mesh import (create_mesh, batch_sharding, replicated_sharding,
                   shard_batch, local_process_info)

__all__ = ["create_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch", "local_process_info"]
