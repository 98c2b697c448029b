"""Graph pooling layers (reference: ``pgl/nn/pool.py``).

``GraphPool``/``GraphNorm``/``Set2Set``/``GlobalAttention`` are jit-safe.
``SAGPool`` selects a dynamic node subset (``segment_topk``) and therefore —
like the reference, which also materializes a new Graph per call
(``pgl/nn/pool.py:182-252``) — runs host-side between jitted stages.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from .. import math as gmath
from .functional import graph_op as GF

__all__ = ["GraphPool", "GraphNorm", "Set2Set", "GlobalAttention", "SAGPool"]


class GraphPool(nn.Module):
    """Pool node features per subgraph (reference ``pgl/nn/pool.py:30``)."""
    pool_type: str = "sum"

    @nn.compact
    def __call__(self, graph, feature):
        return GF.graph_pool(graph, feature, self.pool_type)


class GraphNorm(nn.Module):
    """Divide node features by sqrt(per-graph node count)
    (reference ``pgl/nn/pool.py:65``)."""

    @nn.compact
    def __call__(self, graph, feature):
        return GF.graph_norm(graph, feature)


class Set2Set(nn.Module):
    """Set2Set global pooling: LSTM-attention iterations producing a
    ``[num_graph, 2*input_dim]`` readout (reference ``pgl/nn/pool.py:96``)."""
    input_dim: int
    n_iters: int
    n_layers: int = 1

    @nn.compact
    def __call__(self, graph, x):
        batch_size = graph.num_graph
        graph_id = graph.graph_node_id
        cells = [nn.OptimizedLSTMCell(self.input_dim, name=f"lstm_{i}")
                 for i in range(self.n_layers)]
        carries = [
            c.initialize_carry(jax.random.key(0), (batch_size, 2 * self.input_dim))
            for c in cells]
        q_star = jnp.zeros((batch_size, 2 * self.input_dim), x.dtype)
        for _ in range(self.n_iters):
            h = q_star
            new_carries = []
            for cell, carry in zip(cells, carries):
                carry, h = cell(carry, h)
                new_carries.append(carry)
            carries = new_carries
            q = h  # [batch, input_dim]
            e = jnp.sum(x * q[graph_id], axis=-1, keepdims=True)
            a = gmath.segment_softmax(e, graph_id, num_segments=batch_size,
                                      indices_are_sorted=True)
            r = gmath.segment_sum(a * x, graph_id, num_segments=batch_size,
                                  indices_are_sorted=True)
            q_star = jnp.concatenate([q, r], axis=-1)
        return q_star


class GlobalAttention(nn.Module):
    """Gated global attention pooling (reference ``pgl/nn/pool.py:148``).

    ``gate`` maps ``[N, d] -> [N, 1]`` scores; ``feat_nn`` optionally
    transforms features before the weighted sum.
    """
    gate: Callable
    feat_nn: Optional[Callable] = None

    @nn.compact
    def __call__(self, graph, x):
        graph_id = graph.graph_node_id
        gate_x = self.gate(x).reshape(-1, 1)
        if self.feat_nn is not None:
            x = self.feat_nn(x)
        gate_x = gmath.segment_softmax(gate_x, graph_id,
                                       num_segments=graph.num_graph,
                                       indices_are_sorted=True)
        return gmath.segment_sum(gate_x * x, graph_id,
                                 num_segments=graph.num_graph,
                                 indices_are_sorted=True)


class SAGPool(nn.Module):
    """Self-attention graph pooling: GNN-scored top-k node selection plus
    induced-subgraph rebuild (reference ``pgl/nn/pool.py:182``).

    Two modes:

    * default (dynamic) — like the reference, materializes a smaller graph
      host-side between jitted stages; returns ``(x, batch, graph)``.
    * ``static=True`` — fully jittable: selection becomes a boolean
      keep-mask (``segment_topk_mask``), dropped nodes' features are zeroed
      in place and the same graph is returned; returns
      ``(x, keep_mask, graph)``. Sum-pool readouts are exact under this
      masking; mean readouts should divide by ``segment_sum(keep_mask)``.
    """
    input_dim: int
    ratio: float = 0.5
    gnn: Any = None
    min_score: Optional[float] = None
    nonlinearity: Optional[Callable] = None
    static: bool = False

    @nn.compact
    def __call__(self, graph, x):
        from .conv import GCNConv
        from ..utils.transform import filter_adj
        from ..graph import Graph

        gnn = self.gnn if self.gnn is not None else GCNConv(
            self.input_dim, 1, name="score_gnn")
        batch = graph.graph_node_id
        score = gnn(graph, x).reshape(-1)
        if self.min_score is None:
            nonlin = self.nonlinearity or jnp.tanh
            score = nonlin(score)
        else:
            score = gmath.segment_softmax(score, batch,
                                          num_segments=graph.num_graph,
                                          indices_are_sorted=True)
        if self.static:
            keep = gmath.segment_topk_mask(score, batch,
                                           num_segments=graph.num_graph,
                                           ratio=self.ratio,
                                           min_score=self.min_score)
            x = x * (score * keep.astype(score.dtype)).reshape(-1, 1)
            return x, keep, graph
        out, rank = gmath.segment_topk(x, score, batch,
                                       num_segments=graph.num_graph,
                                       ratio=self.ratio,
                                       min_score=self.min_score)
        x = out * score[rank].reshape(-1, 1)
        new_batch = np.asarray(batch)[np.asarray(rank)]
        host_edges = np.asarray(graph.edges)
        edges, kept_edge_graph = filter_adj(
            host_edges, np.asarray(rank), num_nodes=score.shape[0],
            edge_attr=np.asarray(graph.graph_edge_id))
        counts = np.bincount(new_batch, minlength=graph.num_graph)
        gni = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        # per-graph edge offsets of the pooled graph, so graph_edge_id
        # stays correct after pooling (edges keep their original
        # per-graph grouping/order)
        ecounts = np.bincount(np.asarray(kept_edge_graph),
                              minlength=graph.num_graph)
        gei = np.concatenate([[0], np.cumsum(ecounts)]).astype(np.int32)
        g = Graph(np.asarray(edges), num_nodes=int(x.shape[0]),
                  node_feat={"attr": np.asarray(x)},
                  _graph_node_index=gni,
                  _graph_edge_index=gei,
                  _num_graph=graph.num_graph)
        if graph.is_tensor:  # keep the caller's device/host mode
            g = g.tensor()
        return x, jnp.asarray(new_batch), g
