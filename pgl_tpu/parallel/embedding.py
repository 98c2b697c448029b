"""Sharded embedding tables over a device mesh — the TPU-native replacement
for the reference's parameter-server sparse embeddings (fleet async PS,
``apps/Graph4Rec/env_run/src/dist_cpu_train.py:51-66``) and PGLBox's GPU
parameter server (``core.PSGPU``, ``apps/PGLBox/src/embedding.py:33-57``).

The table is one jax array sharded row-wise across the mesh; lookups are
XLA gathers (compiled to all-to-all + local gather by GSPMD) and updates are
sparse scatter-adds on the sharded array. For tables beyond total HBM, pair
with :class:`pgl_tpu.utils.shared_embedding.SharedEmbedding` (host RAM) and
stage rows per step.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["ShardedEmbedding"]


class ShardedEmbedding:
    """Row-sharded embedding table.

    Args:
      num_embeddings / embedding_dim: table shape (rows padded up to a
        multiple of the mesh axis size).
      mesh / axis: placement.
      scale: uniform init range.
    """

    def __init__(self, num_embeddings: int, embedding_dim: int, mesh: Mesh,
                 axis: str = "data", scale: Optional[float] = None,
                 seed: int = 0, dtype=jnp.float32):
        self.mesh = mesh
        self.axis = axis
        self.num_embeddings = num_embeddings
        self.embedding_dim = embedding_dim
        n_shards = mesh.shape[axis]
        padded = (num_embeddings + n_shards - 1) // n_shards * n_shards
        scale = scale if scale is not None else 1.0 / np.sqrt(embedding_dim)
        host = np.random.default_rng(seed).uniform(
            -scale, scale, (padded, embedding_dim)).astype(dtype)
        self.sharding = NamedSharding(mesh, P(axis, None))
        self.table = jax.device_put(host, self.sharding)

    def lookup(self, ids):
        """Gather rows; ids may live on any device (replicated)."""
        return jnp.take(self.table, ids, axis=0)

    def apply_sparse_grad(self, ids, grad, lr: float):
        """SGD scatter-add update, keeping the table sharded."""
        self.table = _sparse_update(self.table, ids, grad, lr)

    def as_params(self):
        """Expose the table for optax-managed training."""
        return self.table

    def set_params(self, table):
        self.table = table


@jax.jit
def _sparse_update(table, ids, grad, lr):
    return table.at[ids].add(-lr * grad)
