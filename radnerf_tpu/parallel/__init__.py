"""Parallelism layer: jax.sharding meshes + data-parallel helpers."""

from .mesh import (
    create_mesh,
    replicate,
    shard_batch,
    shard_rays,
)

__all__ = ["create_mesh", "replicate", "shard_batch", "shard_rays"]
