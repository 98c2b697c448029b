"""Host-side graph transforms (reference: ``pgl/utils/transform.py``).

These rewrite edge sets, so they operate on numpy-mode graphs (the reference
enforces the same, ``transform.py:42-44``); the jit-safe dense-batch helper
``to_dense_batch`` works on device tensors.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax.numpy as jnp

from .. import math as gmath

__all__ = ["to_undirected", "add_self_loops", "to_dense_batch",
           "filter_adj", "drop_edge"]


def _require_numpy(graph):
    if graph.is_tensor:
        raise TypeError("The input graph should be numpy format.")


def to_undirected(graph, copy_node_feat: bool = True,
                  copy_edge_feat: bool = False):
    """Symmetrize the edge set (dedup) — reference ``transform.py:25-61``."""
    from ..graph import Graph
    _require_numpy(graph)
    edges = np.asarray(graph.edges)
    inv = edges[:, ::-1]
    all_edges = np.unique(np.vstack([edges, inv]), axis=0)
    if copy_edge_feat:
        raise NotImplementedError(
            "edge features cannot be carried through deduplication")
    node_feat = dict(graph.node_feat) if copy_node_feat else None
    return Graph(all_edges, num_nodes=graph.num_nodes, node_feat=node_feat)


def add_self_loops(graph, copy_node_feat: bool = True,
                   copy_edge_feat: bool = False, replace: bool = False):
    """Append (or, with ``replace=True``, first strip then append) self-loop
    edges — reference ``transform.py:64-98``; ``replace`` mirrors the in-layer
    rewrite APPNP/GPR do at ``pgl/nn/conv.py:476-485``."""
    from ..graph import Graph
    _require_numpy(graph)
    edges = np.asarray(graph.edges)
    if replace:
        edges = edges[edges[:, 0] != edges[:, 1]]
    loops = np.stack([np.arange(graph.num_nodes)] * 2, axis=1)
    # both modes append loops AFTER the (possibly stripped) edges so
    # positional per-edge data lines up identically
    all_edges = np.vstack([edges, loops])
    if copy_edge_feat:
        raise NotImplementedError(
            "self-loop edges have no feature values to copy")
    node_feat = dict(graph.node_feat) if copy_node_feat else None
    return Graph(all_edges.astype(edges.dtype if edges.size else np.int64),
                 num_nodes=graph.num_nodes, node_feat=node_feat)


def to_dense_batch(x, graph, fill_value=0.0,
                   max_num_nodes: Optional[int] = None):
    """Pack per-node features into ``[num_graph, max_num_nodes, d]``.

    Returns ``(out, mask)`` where ``mask`` is True at *dummy* (padding)
    positions, matching the reference contract (``transform.py:101-136``).
    ``max_num_nodes`` must be static under jit.
    """
    graph_node_id = graph.graph_node_id
    batch_size = graph.num_graph
    num_nodes = gmath.segment_count(graph_node_id, num_segments=batch_size,
                                    indices_are_sorted=True)
    cum = jnp.cumsum(num_nodes) - num_nodes
    if max_num_nodes is None:
        # data-dependent: host/eager only. Pass a static cap to use under jit.
        max_num_nodes = int(jnp.max(num_nodes))
    pos = jnp.arange(graph_node_id.shape[0]) - cum[graph_node_id]
    size = (batch_size * max_num_nodes,) + tuple(x.shape[1:])
    # nodes beyond the cap are dropped (sentinel index + drop mode), not
    # silently written into the next graph's rows
    idx = jnp.where(pos < max_num_nodes,
                    pos + graph_node_id * max_num_nodes, size[0])
    out = jnp.full(size, fill_value, dtype=x.dtype).at[idx].set(
        x, mode="drop")
    out = out.reshape((batch_size, max_num_nodes) + tuple(x.shape[1:]))
    mask = jnp.ones((batch_size * max_num_nodes,), bool).at[idx].set(
        False, mode="drop")
    return out, mask.reshape(batch_size, max_num_nodes)


def filter_adj(edge_index, perm, edge_attr=None,
               num_nodes: Optional[int] = None):
    """Keep edges whose endpoints both survive ``perm`` and reindex them to
    the new compact ids (reference ``transform.py:138-168``). Host-side."""
    edge_index = np.asarray(edge_index)
    perm = np.asarray(perm)
    if num_nodes is None:
        hi = int(edge_index.max()) + 1 if edge_index.size else 0
        if perm.size:
            hi = max(hi, int(perm.max()) + 1)   # isolated kept nodes
        num_nodes = hi
    lut = np.full(num_nodes, -1, dtype=np.int64)
    lut[perm] = np.arange(len(perm))
    row, col = lut[edge_index[:, 0]], lut[edge_index[:, 1]]
    keep = (row >= 0) & (col >= 0)
    out = np.stack([row[keep], col[keep]], axis=1)
    if edge_attr is not None:
        return out, np.asarray(edge_attr)[keep]
    return out, None


def drop_edge(graph, rate: float = 0.5, seed=None,
              copy_node_feat: bool = True):
    """Randomly drop edges (DropEdge regularization; idea from the
    reference's legacy ``DropEdgeWrapper``, ``legacy/pgl/graph_wrapper.py:
    737``). Host-side: returns a new Graph with ~``(1-rate)·E`` edges;
    re-tensor per epoch (or every k epochs) during training.
    ``seed=None`` (default) draws fresh entropy per call — a fixed
    default would drop the identical subset every epoch, silently
    disabling the regularization; pass a seed for reproducibility."""
    from ..graph import Graph
    _require_numpy(graph)
    rng = np.random.default_rng(seed)
    keep = rng.random(graph.num_edges) >= rate
    edges = np.asarray(graph.edges)[keep]
    edge_feat = {k: np.asarray(v)[keep] for k, v in graph.edge_feat.items()}
    node_feat = dict(graph.node_feat) if copy_node_feat else None
    return Graph(edges, num_nodes=graph.num_nodes, node_feat=node_feat,
                 edge_feat=edge_feat)
