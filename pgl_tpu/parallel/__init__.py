"""Multi-device / multi-host parallelism over `jax.sharding.Mesh`.

Replaces the reference's NCCL/brpc/MPI distributed stack (SURVEY.md §2.3)
with mesh-sharded programs: edge-partitioned graphs (``ShardedGraph``, the
``DistGPUGraph`` analog), data-parallel helpers, and sharded embedding
tables.
"""

from .dist_graph import ShardedGraph, shard_edges

__all__ = ["ShardedGraph", "shard_edges"]
