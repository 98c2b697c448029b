"""Heterogeneous halo-partitioned graphs — one :class:`HaloGraph` per edge
type over a SHARED node partition.

The reference's multi-GPU hetero path replicates the node tensor and runs
each relation's aggregation against the full graph (R-GCN loop over
``graph[etype].send_recv`` at ``pgl/nn/conv.py:1014-1023``; R-UniMP's
relation-wise TransformerConvs at
``examples/kddcup2021/MAG240M/r_unimp/models/r_unimp.py``).  Here the node
space is partitioned ONCE — by METIS on the union of all relations, so the
cut counts every etype's edges — and each relation gets its own
:class:`HaloGraph` built from the same ``parts`` array.  Because ownership
(and therefore ``node_perm`` / ``N_pad``) depends only on ``parts``, every
per-etype graph shares the identical ``[S, N_pad, ...]`` node layout:
features shard once, and per-relation layers compose freely.

Usage::

    hhg = HaloHeterGraph.from_heter_graph(heter_g, mesh)
    x = hhg.shard_node_values(feat)                  # [S, N_pad, D]
    out = RGCNConv(...)(hhg, x)                      # graph[etype] per rel
    out = RUniMP(...)(hhg, x, label, mask)           # dot-attention per rel

A ``HaloHeterGraph`` is a pytree — pass it as a jit ARGUMENT (never close
over it).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

import jax

from .halo_graph import HaloGraph
from jax.sharding import Mesh

__all__ = ["HaloHeterGraph"]


@jax.tree_util.register_pytree_node_class
class HaloHeterGraph:
    def __init__(self, subgraphs: Dict[str, HaloGraph], node_feat=None):
        if not subgraphs:
            raise ValueError("need at least one edge type")
        self._subgraphs = dict(subgraphs)
        self.node_feat = node_feat or {}

    # -- construction -------------------------------------------------------

    @classmethod
    def from_heter_graph(cls, graph, mesh: Mesh, axis: str = "node",
                         parts: Optional[np.ndarray] = None,
                         partition: str = "metis",
                         halo_dtype=None) -> "HaloHeterGraph":
        """Partition ``graph`` (a :class:`pgl_tpu.HeterGraph`) over
        ``mesh[axis]`` with one shared node assignment.

        ``partition``: "metis" partitions the UNION of all relations'
        edges (the cut the halo exchanges actually pay spans every etype),
        "range" uses contiguous id blocks; or pass ``parts`` explicitly.
        """
        g = graph.numpy() if getattr(graph, "is_tensor", False) else graph
        num_nodes = g.num_nodes
        etypes = list(g.edge_types)
        if parts is None and partition == "metis":
            from ..partition import metis_partition
            from ..graph import Graph
            union = np.concatenate(
                [np.asarray(g[t].edges).reshape(-1, 2) for t in etypes])
            parts = metis_partition(
                Graph(union, num_nodes=num_nodes), mesh.shape[axis])
        from ..graph import Graph
        subs = {}
        for t in etypes:
            # feat-less per-etype graphs: node features are shared across
            # relations, so they shard ONCE at the hetero level below
            # (not one copy per etype)
            bare = Graph(np.asarray(g[t].edges), num_nodes=num_nodes)
            subs[t] = HaloGraph.from_graph(bare, mesh, axis=axis,
                                           parts=parts,
                                           halo_dtype=halo_dtype)
        obj = cls(subs)
        any_sub = next(iter(subs.values()))
        obj.node_feat = {k: any_sub.shard_node_values(np.asarray(v))
                         for k, v in getattr(g, "node_feat", {}).items()}
        obj._host_parts = parts
        return obj

    # -- mapping ------------------------------------------------------------

    def __getitem__(self, etype: str) -> HaloGraph:
        return self._subgraphs[etype]

    def __contains__(self, etype: str) -> bool:
        return etype in self._subgraphs

    @property
    def edge_types(self) -> Sequence[str]:
        return list(self._subgraphs)

    @property
    def num_nodes(self) -> int:
        return self._any.num_nodes

    @property
    def num_shards(self) -> int:
        return self._any.num_shards

    @property
    def halo_size(self) -> int:
        """Total boundary rows per layer if every relation aggregates."""
        return sum(s.halo_size for s in self._subgraphs.values())

    @property
    def _any(self) -> HaloGraph:
        return next(iter(self._subgraphs.values()))

    # node-space layout is identical across etypes (same parts)
    def shard_node_values(self, values):
        return self._any.shard_node_values(values)

    def unshard_node_values(self, x):
        return self._any.unshard_node_values(x)

    def indegree(self):
        """Summed over relations (matches HeterGraph.indegree on the
        union of edges)."""
        out = None
        for s in self._subgraphs.values():
            d = s.indegree()
            out = d if out is None else out + d
        return out

    # -- persistence --------------------------------------------------------

    def save(self, directory: str):
        """Persist every relation's partition (one npz per etype, plus a
        shared feature file) so a production boot skips the union-METIS +
        per-relation halo builds."""
        import os
        import json
        os.makedirs(directory, exist_ok=True)
        for t, sub in self._subgraphs.items():
            sub.save(os.path.join(directory, f"{t}.npz"))
        if self.node_feat:
            np.savez_compressed(
                os.path.join(directory, "feats.npz"),
                **{k: np.asarray(self.unshard_node_values(v))
                   for k, v in self.node_feat.items()})
        with open(os.path.join(directory, "meta.json"), "w") as f:
            json.dump({"etypes": list(self._subgraphs)}, f)

    @classmethod
    def load(cls, directory: str, mesh: Mesh) -> "HaloHeterGraph":
        import os
        import json
        with open(os.path.join(directory, "meta.json")) as f:
            meta = json.load(f)
        subs = {t: HaloGraph.load(os.path.join(directory, f"{t}.npz"),
                                  mesh) for t in meta["etypes"]}
        obj = cls(subs)
        fp = os.path.join(directory, "feats.npz")
        if os.path.exists(fp):
            z = np.load(fp)
            obj.node_feat = {k: obj.shard_node_values(z[k])
                             for k in z.files}
        return obj

    # -- pytree -------------------------------------------------------------

    def tree_flatten(self):
        keys = sorted(self._subgraphs)
        children = tuple(self._subgraphs[k] for k in keys) + \
            (self.node_feat,)
        return children, tuple(keys)

    @classmethod
    def tree_unflatten(cls, keys, children):
        obj = object.__new__(cls)
        obj._subgraphs = dict(zip(keys, children[:len(keys)]))
        obj.node_feat = children[len(keys)]
        return obj

    def __repr__(self):
        return (f"HaloHeterGraph(num_nodes={self.num_nodes}, "
                f"etypes={self.edge_types}, shards={self.num_shards})")
