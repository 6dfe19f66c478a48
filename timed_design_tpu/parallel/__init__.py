"""Parallel: mesh construction and sharding helpers."""
from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
