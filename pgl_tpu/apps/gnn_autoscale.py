"""GNNAutoScale (GAS) — training full-graph GNNs one partition at a time
with historical embeddings.

Capability parity with the reference ``apps/GNNAutoScale``: per-layer
``History`` buffers (``history.py:25-46``), the push/pull orchestration of
``ScalableGNN`` (``gnn_models/base_model.py:31-210``), and METIS/random
partition batching (``graph_partition.py``).

TPU-native shape: histories live in **host RAM** (the pinned-memory pool of
the reference maps to plain numpy + async ``jax.device_put`` staging; TPU
HBM only holds the current partition's rows). One training step per
partition:

  1. pull history rows for the partition's out-of-batch neighbors,
  2. run layer k on [batch ∪ halo] with exact in-batch features and
     historical halo features,
  3. push the fresh in-batch activations back into history k.

Pull/push overlap with compute PGLBox-style (reference ``StreamPool``
rotation, ``pgl/utils/stream_pool.py:27-80``, driven from
``apps/GNNAutoScale/gnn_models/base_model.py:31-100``): while batch ``k``
trains, batch ``k+1``'s halo rows are already staging host→HBM and batch
``k-1``'s fresh activations are scattering HBM→host on pool threads —
:meth:`ScalableGNN.iter_batches` / :meth:`ScalableGNN.push_fresh_async`.
"""

from __future__ import annotations

import threading
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from ..partition import metis_partition, random_partition
from ..sampling.custom import subgraph as extract_subgraph
from ..utils.stream_pool import StreamPool

__all__ = ["History", "ScalableGNN", "partition_batches"]


class History:
    """Host-RAM per-layer activation history (reference ``history.py:25``).

    A per-history lock serializes concurrent async pull/push touching the
    same buffer (the reference orders these with CUDA stream events) —
    GAS reads may be one step staler, never torn.
    """

    def __init__(self, num_embs: int, emb_dim: int, dtype=np.float32):
        self.emb = np.zeros((num_embs, emb_dim), dtype=dtype)
        self._lock = threading.Lock()

    def pull(self, index) -> jnp.ndarray:
        """Host → device gather of history rows."""
        with self._lock:
            rows = np.ascontiguousarray(self.emb[np.asarray(index)])
        return jnp.asarray(rows)

    def push(self, index, values):
        """Device → host scatter of fresh activations."""
        values = np.asarray(values)        # device readback outside the lock
        with self._lock:
            self.emb[np.asarray(index)] = values

    def async_pull(self, index, pool: StreamPool):
        """Queue :meth:`pull` on the pool; returns a future of the device
        array (reference ``async_pull``, ``stream_pool.py:40``)."""
        return pool.submit(self.pull, index)

    def async_push(self, index, values, pool: StreamPool):
        """Queue :meth:`push` on the pool (reference ``async_push``)."""
        return pool.submit(self.push, index, values)

    def reset(self):
        with self._lock:
            self.emb[:] = 0


def partition_batches(graph, num_parts: int, method: str = "metis",
                      seed: int = 0):
    """Partition nodes and build per-part [batch ∪ halo] subgraphs.

    Returns a list of dicts with keys:
      ``nodes``      — global ids, batch nodes first then halo,
      ``batch_size`` — number of in-batch nodes,
      ``subgraph``   — reindexed Graph over ``nodes`` containing every edge
                       whose dst is in-batch (src may be halo).
    """
    g = graph.numpy() if graph.is_tensor else graph
    parts = (metis_partition(g, num_parts, seed) if method == "metis"
             else random_partition(g, num_parts, seed))
    edges = np.asarray(g.edges)
    out = []
    for p in range(num_parts):
        batch_nodes = np.nonzero(parts == p)[0]
        in_batch = np.zeros(g.num_nodes, bool)
        in_batch[batch_nodes] = True
        emask = in_batch[edges[:, 1]]
        sub_edges = edges[emask]
        halo = np.setdiff1d(np.unique(sub_edges[:, 0]), batch_nodes)
        nodes = np.concatenate([batch_nodes, halo])
        sg = extract_subgraph(g, nodes=nodes, eid=np.nonzero(emask)[0])
        out.append({"nodes": nodes, "batch_size": len(batch_nodes),
                    "subgraph": sg})
    return out


class ScalableGNN:
    """Orchestrates a layer stack over partition batches with histories.

    Args:
      num_nodes: global node count.
      layer_fns: list of ``fn(params_k, subgraph, x) -> x`` per layer (the
        caller owns params/modules; this class owns the histories).
      hidden_dims: output dim of each non-final layer (history shapes).
    """

    def __init__(self, num_nodes: int, layer_fns: Sequence[Callable],
                 hidden_dims: Sequence[int], pool_size: int = 2):
        assert len(hidden_dims) == len(layer_fns) - 1
        self.layer_fns = list(layer_fns)
        self.histories = [History(num_nodes, d) for d in hidden_dims]
        self.pool = StreamPool(pool_size)

    def pull_halo(self, batch):
        """Fetch each layer's historical rows for the batch's halo nodes
        (host→device, *before* the jitted/grad-traced compute)."""
        halo = batch["nodes"][batch["batch_size"]:]
        return [h.pull(halo) for h in self.histories]

    def prefetch_halo(self, batch):
        """Async :meth:`pull_halo`: queue every layer's halo-row staging on
        the stream pool; returns a list of futures."""
        halo = batch["nodes"][batch["batch_size"]:]
        return [h.async_pull(halo, self.pool) for h in self.histories]

    def push_fresh_async(self, batch, fresh):
        """Async :meth:`push_fresh`: the device→host scatter of each
        layer's fresh rows overlaps the next batch's compute."""
        in_batch = batch["nodes"][:batch["batch_size"]]
        for hist, values in zip(self.histories, fresh):
            hist.async_push(in_batch, values, self.pool)

    def iter_batches(self, batches):
        """Double-buffered epoch iterator: yields ``(batch, halo_inputs)``
        with batch ``k+1``'s history pull already in flight while batch
        ``k`` trains (reference overlap at ``base_model.py:31-100``).
        Combine with :meth:`push_fresh_async` for write-side overlap; call
        ``self.pool.synchronize()`` at epoch end before evaluation.
        """
        if not batches:
            return
        nxt = self.prefetch_halo(batches[0])
        for i, b in enumerate(batches):
            cur = [f.result() for f in nxt]
            if i + 1 < len(batches):
                nxt = self.prefetch_halo(batches[i + 1])
            yield b, cur

    def forward_batch(self, params_list, batch, x, halo_inputs):
        """One partition's pure forward.

        ``x`` is the device feature block for ``batch['nodes']`` and
        ``halo_inputs`` the output of :meth:`pull_halo`. Returns
        ``(out_batch, fresh)`` where ``fresh[k]`` are the in-batch
        activations to push into history ``k`` (pass to
        :meth:`push_fresh` outside the traced region).
        """
        bs = batch["batch_size"]
        sg = batch["subgraph"]
        sg = sg.tensor() if not sg.is_tensor else sg
        fresh = []
        for k, fn in enumerate(self.layer_fns):
            x = fn(params_list[k], sg, x)
            if k < len(self.layer_fns) - 1:
                fresh.append(x[:bs])
                # out-of-batch rows come from history (stale but full-graph)
                x = jnp.concatenate([x[:bs], halo_inputs[k]], axis=0)
        return x[:bs], fresh

    def push_fresh(self, batch, fresh):
        """Write the fresh in-batch activations back (device→host)."""
        in_batch = batch["nodes"][:batch["batch_size"]]
        for hist, values in zip(self.histories, fresh):
            hist.push(in_batch, values)

    def inference_full(self, params_list, graph, x):
        """Exact full-graph layer-by-layer inference (no histories)."""
        gt = graph.tensor() if not graph.is_tensor else graph
        h = jnp.asarray(x)
        for k, fn in enumerate(self.layer_fns):
            h = fn(params_list[k], gt, h)
        return h
