"""Mesh + sharding (pjit data parallelism over frames; model axis reserved)."""

from .mesh import (batch_sharding, data_parallel_size, make_mesh,
                   pad_to_multiple, replicate, replicated, shard_batch)

__all__ = ["batch_sharding", "data_parallel_size", "make_mesh",
           "pad_to_multiple", "replicate", "replicated", "shard_batch"]
