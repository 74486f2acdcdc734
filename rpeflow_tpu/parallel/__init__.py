"""Device-mesh and sharding helpers."""

from .mesh import (
    get_mesh,
    get_mesh_for_batch,
    make_batch_sharding,
    replicate,
    shard_batch,
)

__all__ = ["get_mesh", "get_mesh_for_batch", "make_batch_sharding",
           "replicate", "shard_batch"]
