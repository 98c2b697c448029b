"""Multi-device / multi-host parallelism over `jax.sharding.Mesh`.

Replaces the reference's NCCL/brpc/MPI distributed stack (SURVEY.md §2.3)
with mesh-sharded programs: edge-partitioned graphs (``ShardedGraph``, the
``DistGPUGraph`` analog), data-parallel helpers, sharded embedding tables,
and multi-host bootstrap/loading helpers.
"""

from .dist_graph import ShardedGraph, shard_edges
from .halo_graph import HaloGraph, build_halo_partition
from .halo_heter import HaloHeterGraph
from .embedding import ShardedEmbedding
from . import multihost

__all__ = ["ShardedGraph", "shard_edges", "HaloGraph",
           "build_halo_partition", "HaloHeterGraph", "ShardedEmbedding",
           "multihost"]
