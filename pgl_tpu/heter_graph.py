"""HeterGraph — heterogeneous graph as a dict of per-edge-type homogeneous
Graphs over one shared node space.

Capability parity with the reference ``pgl/heter_graph.py`` (construction
``:77-134``, ``__getitem__`` ``:196``, typed node sets ``:97-99`` /
``num_nodes_by_type`` ``:201``, per-etype degree/neighbors/sampling
``:209-348``, typed ``node_batch_iter`` ``:349``, tensor/numpy ``:393,425``,
dump/load ``:456,486``).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence

import numpy as np

import jax

from .graph import Graph

__all__ = ["HeterGraph"]


@jax.tree_util.register_pytree_node_class
class HeterGraph:
    def __init__(self, edges: Dict, num_nodes: Optional[int] = None,
                 node_types=None, node_feat: Optional[Dict] = None,
                 edge_feat: Optional[Dict] = None, **kwargs):
        """
        Args:
          edges: dict etype → [E_t, 2] array.
          num_nodes: shared node count (inferred from edges/node_types if
            omitted).
          node_types: list of (node_id, type_str) pairs or an array of type
            strings indexed by node id.
          node_feat: dict name → [N, ...] (shared across types).
          edge_feat: dict etype → {name: [E_t, ...]}.
        """
        if not isinstance(edges, dict):
            raise TypeError("edges must be a dict of etype -> [E, 2] array")
        self._edges_dict = {k: np.asarray(v) if not isinstance(v, jax.Array)
                            else v for k, v in edges.items()}
        if num_nodes is None:
            mx = 0
            for v in self._edges_dict.values():
                if np.asarray(v).size:
                    mx = max(mx, int(np.asarray(v).max()) + 1)
            if node_types is not None:
                mx = max(mx, len(self._normalize_node_types(node_types, mx)))
            num_nodes = mx
        self._num_nodes = int(num_nodes)
        self._node_types = (self._normalize_node_types(node_types,
                                                       self._num_nodes)
                            if node_types is not None else None)
        node_feat = node_feat or {}
        edge_feat = edge_feat or {}
        prebuilt = kwargs.get("_subgraphs")
        if prebuilt is not None:
            self._subgraphs = prebuilt
        else:
            self._subgraphs = {
                etype: Graph(e, num_nodes=self._num_nodes,
                             node_feat=node_feat,
                             edge_feat=edge_feat.get(etype))
                for etype, e in self._edges_dict.items()}
        self._node_feat = node_feat

    @staticmethod
    def _normalize_node_types(node_types, num_nodes):
        if isinstance(node_types, np.ndarray) and node_types.ndim == 1 \
                and not isinstance(node_types[0], (tuple, list)):
            return node_types
        pairs = list(node_types)
        hi = max((int(nid) for nid, _ in pairs), default=-1) + 1
        arr = np.empty(max(num_nodes, hi), dtype=object)
        for nid, ntype in pairs:
            arr[int(nid)] = ntype
        return arr

    # -- structure ----------------------------------------------------------

    @property
    def edge_types(self):
        return list(self._subgraphs.keys())

    @property
    def num_nodes(self) -> int:
        return self._num_nodes

    @property
    def num_edges(self) -> int:
        return sum(g.num_edges for g in self._subgraphs.values())

    @property
    def node_types(self):
        return self._node_types

    @property
    def nodes(self):
        return np.arange(self._num_nodes)

    @property
    def node_feat(self):
        return self._node_feat

    @property
    def edge_feat(self):
        return {etype: g.edge_feat for etype, g in self._subgraphs.items()}

    def __getitem__(self, edge_type) -> Graph:
        return self._subgraphs[edge_type]

    def edge_types_info(self):
        return self.edge_types

    @property
    def is_tensor(self) -> bool:
        return next(iter(self._subgraphs.values())).is_tensor

    def num_nodes_by_type(self, n_type=None):
        if self._node_types is None:
            raise ValueError("node_types were not provided")
        if n_type is None:
            types, counts = np.unique(
                self._node_types[self._node_types != None],  # noqa: E711
                return_counts=True)
            return list(zip(types.tolist(), counts.tolist()))
        return int((self._node_types == n_type).sum())

    def nodes_by_type(self, n_type):
        if self._node_types is None:
            raise ValueError("node_types were not provided")
        return np.nonzero(self._node_types == n_type)[0]

    # -- per-etype queries --------------------------------------------------

    def _etypes_or(self, edge_type):
        return self.edge_types if edge_type is None else [edge_type]

    def indegree(self, nodes=None, edge_type=None):
        out = sum(self._subgraphs[t].indegree(nodes)
                  for t in self._etypes_or(edge_type))
        return out

    def outdegree(self, nodes=None, edge_type=None):
        return sum(self._subgraphs[t].outdegree(nodes)
                   for t in self._etypes_or(edge_type))

    def successor(self, edge_type, nodes=None, return_eids=False):
        return self._subgraphs[edge_type].successor(nodes, return_eids)

    def predecessor(self, edge_type, nodes=None, return_eids=False):
        return self._subgraphs[edge_type].predecessor(nodes, return_eids)

    def sample_successor(self, edge_type, nodes, max_degree,
                         return_eids=False, seed: int = 0):
        return self._subgraphs[edge_type].sample_successor(
            nodes, max_degree, return_eids, seed)

    def sample_predecessor(self, edge_type, nodes, max_degree,
                           return_eids=False, seed: int = 0):
        return self._subgraphs[edge_type].sample_predecessor(
            nodes, max_degree, return_eids, seed)

    def node_batch_iter(self, batch_size: int, shuffle: bool = True,
                        n_type=None, seed: Optional[int] = None):
        """Batches over all nodes or one node type
        (reference ``heter_graph.py:349``)."""
        nodes = (self.nodes if n_type is None else self.nodes_by_type(n_type))
        nodes = np.array(nodes)
        if shuffle:
            np.random.default_rng(seed).shuffle(nodes)
        for start in range(0, len(nodes), batch_size):
            yield nodes[start:start + batch_size]

    # -- conversion ---------------------------------------------------------

    def tensor(self, sharding=None) -> "HeterGraph":
        # convert the shared node-feature dict once and inject it into every
        # per-etype subgraph (naive per-graph conversion would hold one
        # device copy per edge type)
        import jax.numpy as jnp
        if sharding:
            put = lambda x: jax.device_put(np.asarray(x), sharding)
        else:
            put = lambda x: jnp.asarray(np.asarray(x))
        shared = {k: (v if isinstance(v, jax.Array) else put(v))
                  for k, v in self._node_feat.items()}
        subgraphs = {}
        for k, g in self._subgraphs.items():
            if not g.is_tensor:
                # strip the per-subgraph feature dict before conversion so
                # the (possibly huge) shared table is device_put exactly
                # once, not once per edge type
                saved = g._node_feat
                g._node_feat = {}
                try:
                    gt = g.tensor(sharding)
                finally:
                    g._node_feat = saved
            else:
                import copy as _copy
                gt = _copy.copy(g)   # don't mutate the caller's subgraph
            gt._node_feat = shared
            subgraphs[k] = gt
        obj = object.__new__(HeterGraph)
        obj._edges_dict = {k: g.edges for k, g in subgraphs.items()}
        obj._num_nodes = self._num_nodes
        obj._node_types = self._node_types
        obj._subgraphs = subgraphs
        obj._node_feat = next(iter(subgraphs.values())).node_feat \
            if subgraphs else {}
        return obj

    def numpy(self) -> "HeterGraph":
        subgraphs = {k: g.numpy() for k, g in self._subgraphs.items()}
        obj = object.__new__(HeterGraph)
        obj._edges_dict = {k: g.edges for k, g in subgraphs.items()}
        obj._num_nodes = self._num_nodes
        obj._node_types = self._node_types
        obj._subgraphs = subgraphs
        obj._node_feat = next(iter(subgraphs.values())).node_feat \
            if subgraphs else {}
        return obj

    # -- persistence --------------------------------------------------------

    def dump(self, path: str):
        os.makedirs(path, exist_ok=True)
        meta = {"num_nodes": self._num_nodes,
                "edge_types": self.edge_types}
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
        if self._node_types is not None:
            # keep untyped (None) entries distinguishable from a literal
            # "None" type after the str cast
            nt = np.asarray([t if t is not None else "" 
                             for t in self._node_types], dtype=str)
            np.save(os.path.join(path, "node_types.npy"), nt)
        for etype, g in self._subgraphs.items():
            g.dump(os.path.join(path, f"etype_{etype}"))

    @classmethod
    def load(cls, path: str, mmap_mode="r") -> "HeterGraph":
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        node_types = None
        ntp = os.path.join(path, "node_types.npy")
        if os.path.exists(ntp):
            raw = np.load(ntp, allow_pickle=False)
            node_types = np.empty(len(raw), dtype=object)
            for i, t in enumerate(raw):
                node_types[i] = str(t) if str(t) else None
        subgraphs = {etype: Graph.load(os.path.join(path, f"etype_{etype}"),
                                       mmap_mode)
                     for etype in meta["edge_types"]}
        obj = object.__new__(cls)
        obj._edges_dict = {k: g.edges for k, g in subgraphs.items()}
        obj._num_nodes = meta["num_nodes"]
        obj._node_types = node_types
        obj._subgraphs = subgraphs
        obj._node_feat = next(iter(subgraphs.values())).node_feat \
            if subgraphs else {}
        return obj

    # -- pytree -------------------------------------------------------------

    def tree_flatten(self):
        keys = sorted(self._subgraphs.keys())
        node_types = (tuple(self._node_types.tolist())
                      if self._node_types is not None else None)
        return (tuple(self._subgraphs[k] for k in keys),
                (tuple(keys), self._num_nodes, node_types))

    @classmethod
    def tree_unflatten(cls, aux, children):
        keys, num_nodes, node_types = aux
        if node_types is not None:
            node_types = np.asarray(node_types, dtype=object)
        obj = object.__new__(cls)
        obj._subgraphs = dict(zip(keys, children))
        obj._edges_dict = {k: g.edges if hasattr(g, "edges") else None
                           for k, g in obj._subgraphs.items()}
        obj._num_nodes = num_nodes
        obj._node_types = node_types
        first = next(iter(obj._subgraphs.values()), None)
        obj._node_feat = dict(getattr(first, "node_feat", {}) or {})
        return obj

    def __repr__(self):
        parts = ", ".join(f"{k}: {g.num_edges}"
                          for k, g in self._subgraphs.items())
        return (f"HeterGraph(num_nodes={self._num_nodes}, edges={{{parts}}})")
