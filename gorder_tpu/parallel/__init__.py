from .mesh import (  # noqa: F401
    batch_sharding,
    frame_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)
