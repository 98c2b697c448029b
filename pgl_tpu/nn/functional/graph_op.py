"""Functional graph operators (reference: ``pgl/nn/functional/graph_op.py``).

``edge_softmax`` is TPU-native: the reference gathers logits into dst-sorted
order, softmaxes over contiguous segments, and scatters back to edge order
(``graph_op.py:101-123``). Because our segment softmax accepts unsorted ids,
we normalize **directly over the original edge order** with dst as segment
ids — same math, no gather/scatter round trip.
"""

from __future__ import annotations

import jax.numpy as jnp

from ... import math as gmath

__all__ = ["degree_norm", "graph_pool", "graph_norm", "edge_softmax"]


def degree_norm(graph, mode: str = "indegree", dtype=jnp.float32):
    """``clip(degree, 1)^-0.5`` as a ``[N, 1]`` column
    (reference ``graph_op.py:29-55``)."""
    if mode == "indegree":
        degree = graph.indegree()
    elif mode == "outdegree":
        degree = graph.outdegree()
    else:
        raise ValueError(
            "The degree_norm mode should be in ['indegree', 'outdegree']. "
            f"But receive mode={mode}")
    norm = jnp.maximum(jnp.asarray(degree, dtype=dtype), 1.0) ** -0.5
    # append a feature axis; HaloGraph degrees are [S, N_pad] (sharded), a
    # plain Graph's are [N] — both broadcast against their feature layout
    return jnp.expand_dims(norm, -1)


def graph_pool(graph, feature, pool_type: str):
    """Pool node features per subgraph → ``[num_graph, dim]``
    (reference ``graph_op.py:58-76``)."""
    return gmath.segment_pool(feature, graph.graph_node_id, pool_type,
                              num_segments=graph.num_graph,
                              indices_are_sorted=True)


def graph_norm(graph, feature):
    """Divide each node's features by sqrt(nodes in its subgraph)
    (reference ``graph_op.py:78-99``)."""
    counts = gmath.segment_count(graph.graph_node_id,
                                 num_segments=graph.num_graph,
                                 indices_are_sorted=True)
    norm = jnp.sqrt(counts.astype(feature.dtype))
    return feature / norm[graph.graph_node_id][:, None]


def edge_softmax(graph, logits, norm_by: str = "dst"):
    """Softmax of per-edge logits over each node's incoming (or outgoing)
    edges, returned in original edge order (reference ``graph_op.py:101``)."""
    if hasattr(graph, "edge_softmax"):      # HaloGraph: shard-local op
        if norm_by != "dst":
            raise NotImplementedError(
                "HaloGraph edge_softmax normalizes over incoming edges "
                "(each shard owns all in-edges of its dst rows); "
                "norm_by='src' would need a second exchange")
        return graph.edge_softmax(logits)
    col = 1 if norm_by == "dst" else 0
    seg = graph.edges[:, col]
    return gmath.segment_softmax(logits, seg, num_segments=graph.num_nodes)
