"""Subgraph extraction (reference: ``pgl/sampling/custom.py:23-83``)."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..graph import Graph
from ..native import graph_kernel as native

__all__ = ["subgraph"]


def subgraph(graph, nodes, eid=None, edges=None, with_node_feat: bool = True,
             with_edge_feat: bool = True) -> Graph:
    """Induce a reindexed subgraph on ``nodes``.

    ``eid`` (edge ids into the parent) or ``edges`` (global (src,dst) pairs)
    selects the edge set; endpoints must all be contained in ``nodes``.
    Features are sliced from the parent. Host-side (numpy graphs only).
    """
    if graph.is_tensor:
        raise ValueError("You must call Graph.numpy() first.")
    if eid is None and edges is None:
        raise ValueError("Eid and edges can't be None at the same time.")
    nodes = np.asarray(nodes, dtype=np.int64)
    if edges is None:
        edges = np.asarray(graph.edges)[np.asarray(eid)]
    else:
        edges = np.asarray(edges, dtype=np.int64)

    sub_edge_feat = {}
    if with_edge_feat and graph.edge_feat:
        if eid is None:
            raise ValueError("Eid can not be None with edge features.")
        for key, value in graph.edge_feat.items():
            sub_edge_feat[key] = np.asarray(value)[np.asarray(eid)]

    if edges.size:
        flat = native.map_nodes(nodes, edges.reshape(-1))
        if (flat < 0).any():
            raise ValueError("All edge endpoints must be included in nodes")
        sub_edges = flat.reshape(-1, 2)
    else:
        sub_edges = np.zeros((0, 2), dtype=np.int64)

    sub_node_feat = {}
    if with_node_feat:
        for key, value in graph.node_feat.items():
            sub_node_feat[key] = np.asarray(value)[nodes]

    return Graph(sub_edges, num_nodes=len(nodes), node_feat=sub_node_feat,
                 edge_feat=sub_edge_feat)


def graph_saint_node_sample(graph, batch_nodes, seed: int = 0):
    """GraphSAINT-style node-induced subgraph: keep all edges whose endpoints
    both fall in ``batch_nodes`` (reference ``extract_edges_from_nodes``
    usage, ``pgl/graph_kernel.pyx:396-432`` + Graph4Rec's graphsaint
    sampler). Returns a reindexed subgraph plus the kept nodes."""
    if graph.is_tensor:
        raise ValueError("You must call Graph.numpy() first.")
    nodes = np.unique(np.asarray(batch_nodes, dtype=np.int64))
    idx = graph.adj_src_index
    eids = native.extract_edges_from_nodes(
        np.asarray(idx.indptr), np.asarray(idx.sorted_v),
        np.asarray(idx.sorted_eid), graph.num_nodes, nodes)
    return subgraph(graph, nodes=nodes, eid=np.sort(eids)), nodes
