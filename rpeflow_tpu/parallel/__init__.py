"""Device-mesh and sharding helpers."""

from .mesh import get_mesh, make_batch_sharding, replicate, shard_batch

__all__ = ["get_mesh", "make_batch_sharding", "replicate", "shard_batch"]
