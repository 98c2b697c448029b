"""BiGraph — bipartite graph with distinct src/dst node spaces.

Capability parity with the reference ``pgl/bigraph.py`` (construction
``:123``, src/dst feature dicts ``:556,562``, degree ``:639,661``, per-side
neighbor queries/sampling ``:683-923``, ``send_recv`` ``:1051``, UDF
``send``/``recv`` ``:1087,1159``, batching ``:1283``, dump/load
``:259,464``). Messages flow src→dst; ``recv`` aggregates over the dst node
space.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from .message import Message
from .ops import message_passing as mp
from .ops import segment as S
from .utils.edge_index import EdgeIndex

__all__ = ["BiGraph"]


from .graph import _check_feat_dict, _concat_feats, _is_device_array


@jax.tree_util.register_pytree_node_class
class BiGraph:
    def __init__(self, edges, src_num_nodes: Optional[int] = None,
                 dst_num_nodes: Optional[int] = None,
                 src_node_feat: Optional[Dict] = None,
                 dst_node_feat: Optional[Dict] = None,
                 edge_feat: Optional[Dict] = None, **kwargs):
        is_tensor = _is_device_array(edges)
        if not is_tensor:
            edges = np.asarray(edges)
        if edges.ndim != 2 or edges.shape[1] != 2:
            raise ValueError(f"edges must be [E, 2], got {edges.shape}")
        self._edges = edges
        self._is_tensor = is_tensor
        if src_num_nodes is None or dst_num_nodes is None:
            if is_tensor:
                raise ValueError("src/dst_num_nodes must be given for "
                                 "device graphs")
            src_num_nodes = src_num_nodes or (
                int(edges[:, 0].max()) + 1 if edges.size else 0)
            dst_num_nodes = dst_num_nodes or (
                int(edges[:, 1].max()) + 1 if edges.size else 0)
        self._src_num_nodes = int(src_num_nodes)
        self._dst_num_nodes = int(dst_num_nodes)
        self._num_edges = int(edges.shape[0])
        self._src_node_feat = _check_feat_dict(src_node_feat,
                                               "src_node_feat")
        self._dst_node_feat = _check_feat_dict(dst_node_feat,
                                               "dst_node_feat")
        self._edge_feat = _check_feat_dict(edge_feat, "edge_feat")
        self._adj_src_index = kwargs.get("adj_src_index")
        self._adj_dst_index = kwargs.get("adj_dst_index")
        self._graph_src_node_index = kwargs.get("_graph_src_node_index")
        self._graph_dst_node_index = kwargs.get("_graph_dst_node_index")
        self._graph_edge_index = kwargs.get("_graph_edge_index")
        self._num_graph = int(kwargs.get("_num_graph", 1))
        self._spmm_layouts = kwargs.get("_spmm_layouts", None)

    # -- accessors ----------------------------------------------------------

    @property
    def edges(self):
        return self._edges

    @property
    def num_edges(self) -> int:
        return self._num_edges

    @property
    def src_num_nodes(self) -> int:
        return self._src_num_nodes

    @property
    def dst_num_nodes(self) -> int:
        return self._dst_num_nodes

    @property
    def num_graph(self) -> int:
        return self._num_graph

    @property
    def src_nodes(self):
        return (jnp.arange(self._src_num_nodes, dtype=jnp.int32)
                if self._is_tensor else np.arange(self._src_num_nodes))

    @property
    def dst_nodes(self):
        return (jnp.arange(self._dst_num_nodes, dtype=jnp.int32)
                if self._is_tensor else np.arange(self._dst_num_nodes))

    @property
    def src_node_feat(self) -> Dict:
        return self._src_node_feat

    @property
    def dst_node_feat(self) -> Dict:
        return self._dst_node_feat

    @property
    def edge_feat(self) -> Dict:
        return self._edge_feat

    @property
    def is_tensor(self) -> bool:
        return self._is_tensor

    @property
    def graph_src_node_id(self):
        from .graph import _repeat_from_indptr
        idx = self._graph_src_node_index
        if idx is None:
            zeros = jnp.zeros if self._is_tensor else np.zeros
            return zeros((self._src_num_nodes,), dtype=jnp.int32)
        return _repeat_from_indptr(idx, self._src_num_nodes, self._is_tensor)

    @property
    def graph_dst_node_id(self):
        from .graph import _repeat_from_indptr
        idx = self._graph_dst_node_index
        if idx is None:
            zeros = jnp.zeros if self._is_tensor else np.zeros
            return zeros((self._dst_num_nodes,), dtype=jnp.int32)
        return _repeat_from_indptr(idx, self._dst_num_nodes, self._is_tensor)

    @property
    def graph_edge_id(self):
        from .graph import _repeat_from_indptr
        idx = self._graph_edge_index
        if idx is None:
            zeros = jnp.zeros if self._is_tensor else np.zeros
            return zeros((self._num_edges,), dtype=jnp.int32)
        return _repeat_from_indptr(idx, self._num_edges, self._is_tensor)

    # -- adjacency ----------------------------------------------------------

    @property
    def adj_src_index(self) -> EdgeIndex:
        if self._adj_src_index is None:
            u, v = self._edges[:, 0], self._edges[:, 1]
            self._adj_src_index = (
                EdgeIndex.from_edges_device(u, v, self._src_num_nodes)
                if self._is_tensor
                else EdgeIndex.from_edges(u, v, self._src_num_nodes))
        return self._adj_src_index

    @property
    def adj_dst_index(self) -> EdgeIndex:
        if self._adj_dst_index is None:
            u, v = self._edges[:, 1], self._edges[:, 0]
            self._adj_dst_index = (
                EdgeIndex.from_edges_device(u, v, self._dst_num_nodes)
                if self._is_tensor
                else EdgeIndex.from_edges(u, v, self._dst_num_nodes))
        return self._adj_dst_index

    def sorted_edges(self, sort_by: str = "src"):
        if sort_by == "src":
            idx = self.adj_src_index
            return idx.sorted_u, idx.sorted_v, idx.sorted_eid
        idx = self.adj_dst_index
        return idx.sorted_v, idx.sorted_u, idx.sorted_eid

    # -- degree / neighbors -------------------------------------------------

    def indegree(self, nodes=None):
        """In-degree over the dst node space."""
        deg = self.adj_dst_index.degree
        if nodes is None:
            return deg
        return (jnp.take(deg, nodes) if self._is_tensor
                else np.asarray(deg)[nodes])

    def outdegree(self, nodes=None):
        deg = self.adj_src_index.degree
        if nodes is None:
            return deg
        return (jnp.take(deg, nodes) if self._is_tensor
                else np.asarray(deg)[nodes])

    def _require_numpy(self, what):
        if self._is_tensor:
            raise ValueError(f"{what} is a host-side query; call .numpy()")

    def successor(self, nodes=None, return_eids=False):
        self._require_numpy("successor")
        idx = self.adj_src_index
        return ((idx.view_v(nodes), idx.view_eid(nodes)) if return_eids
                else idx.view_v(nodes))

    def predecessor(self, nodes=None, return_eids=False):
        self._require_numpy("predecessor")
        idx = self.adj_dst_index
        return ((idx.view_v(nodes), idx.view_eid(nodes)) if return_eids
                else idx.view_v(nodes))

    def sample_successor(self, nodes, max_degree, return_eids=False,
                         seed: int = 0):
        self._require_numpy("sample_successor")
        from .graph import _sample_from_index
        return _sample_from_index(self.adj_src_index, nodes, max_degree,
                                  return_eids, seed)

    def sample_predecessor(self, nodes, max_degree, return_eids=False,
                           seed: int = 0):
        self._require_numpy("sample_predecessor")
        from .graph import _sample_from_index
        return _sample_from_index(self.adj_dst_index, nodes, max_degree,
                                  return_eids, seed)

    # -- message passing ----------------------------------------------------

    def _require_tensor(self):
        if not self._is_tensor:
            raise ValueError("You must call BiGraph.tensor() first")

    def send(self, message_func: Callable, src_feat=None, dst_feat=None,
             edge_feat=None) -> Dict:
        """Gather src rows (from the src space) and dst rows (from the dst
        space), apply ``message_func`` per edge (reference ``:1087``)."""
        self._require_tensor()
        src, dst = self._edges[:, 0], self._edges[:, 1]
        gathered_src = {k: mp.gather_rows(v, src)
                        for k, v in (src_feat or {}).items()}
        gathered_dst = {k: mp.gather_rows(v, dst)
                        for k, v in (dst_feat or {}).items()}
        msg = message_func(gathered_src, gathered_dst, dict(edge_feat or {}))
        if not isinstance(msg, dict):
            raise TypeError("message_func must return a dict")
        return msg

    def recv(self, reduce_func, msg: Dict, recv_mode: str = "dst"):
        """Aggregate messages onto the dst (or src) node space
        (reference ``:1159``)."""
        self._require_tensor()
        if not isinstance(msg, dict):
            raise TypeError("msg must be a dict")
        if not msg:
            raise ValueError("msg is empty")
        index = self.adj_dst_index if recv_mode == "dst" \
            else self.adj_src_index
        num = self._dst_num_nodes if recv_mode == "dst" \
            else self._src_num_nodes
        bucketed = Message(msg, index.segment_ids, num,
                           eid=index.sorted_eid, indices_are_sorted=True)
        if callable(reduce_func):
            return reduce_func(bucketed)
        return {k: bucketed.reduce(bucketed[k], reduce_func) for k in msg} \
            if len(msg) > 1 else bucketed.reduce(
                bucketed[next(iter(msg))], reduce_func)

    def send_recv(self, feature, reduce_func: str = "sum"):
        """Fused src→dst SpMM: ``feature`` lives on the src space, output on
        the dst space (reference sum-only at ``:1051``; all four reduces
        supported here). sum/mean ride the Pallas kernel on TPU backends."""
        self._require_tensor()
        if self._adj_dst_index is not None:
            idx = self._adj_dst_index
            if reduce_func in ("sum", "mean") \
                    and self._spmm_layouts is not None:
                from .ops.dispatch import use_pallas_spmm
                if use_pallas_spmm(feature, self._num_edges):
                    from .ops.pallas.segment_kernels import spmm
                    csc, csr = self._spmm_layouts
                    d = feature.shape[1]
                    if d % 128:
                        pad = (-d) % 128
                        feature_p = jnp.concatenate(
                            [feature, jnp.zeros((feature.shape[0], pad),
                                                feature.dtype)], axis=1)
                        out = spmm(feature_p, csc, csr)[:, :d]
                    else:
                        out = spmm(feature, csc, csr)
                    if reduce_func == "mean":
                        deg = jnp.maximum(idx.degree, 1).astype(out.dtype)
                        out = out / deg[:, None]
                    return out
            return S.segment_pool(
                mp.gather_rows(feature, idx.sorted_v), idx.segment_ids,
                reduce_func, num_segments=self._dst_num_nodes,
                indices_are_sorted=True)
        return mp.send_u_recv(feature, self._edges[:, 0], self._edges[:, 1],
                              num_nodes=self._dst_num_nodes,
                              reduce_op=reduce_func)

    # -- conversion ---------------------------------------------------------

    def tensor(self, sharding=None, build_adj: bool = True) -> "BiGraph":
        if self._is_tensor:
            return self
        put = (lambda x: jax.device_put(x, sharding)) if sharding \
            else jnp.asarray
        if build_adj:
            adj_src = self.adj_src_index.tensor(sharding)
            adj_dst = self.adj_dst_index.tensor(sharding)
            from .ops.pallas.segment_kernels import build_blocked_layout
            # same chunk planning as Graph._build_spmm_layouts: bound the
            # gathered [E, D] message buffer for very large graphs
            import os as _os
            chunk_thresh = int(_os.environ.get("PGL_TPU_SPMM_CHUNK_EDGES",
                                               4 * 1024 * 1024))
            chunk = chunk_thresh if (chunk_thresh
                                     and self._num_edges > chunk_thresh) \
                else 0
            spmm_layouts = (
                build_blocked_layout(np.asarray(self.adj_dst_index.indptr),
                                     np.asarray(self.adj_dst_index.sorted_v),
                                     self._dst_num_nodes,
                                     chunk_edges=chunk),
                build_blocked_layout(np.asarray(self.adj_src_index.indptr),
                                     np.asarray(self.adj_src_index.sorted_v),
                                     self._src_num_nodes,
                                     chunk_edges=chunk))
        else:
            spmm_layouts = None
            adj_src = self._adj_src_index and self._adj_src_index.tensor(
                sharding)
            adj_dst = self._adj_dst_index and self._adj_dst_index.tensor(
                sharding)
        conv = lambda idx: (put(np.asarray(idx, dtype=np.int32))
                            if idx is not None else None)
        return BiGraph(
            put(np.asarray(self._edges, dtype=np.int32)),
            src_num_nodes=self._src_num_nodes,
            dst_num_nodes=self._dst_num_nodes,
            src_node_feat={k: put(np.asarray(v))
                           for k, v in self._src_node_feat.items()},
            dst_node_feat={k: put(np.asarray(v))
                           for k, v in self._dst_node_feat.items()},
            edge_feat={k: put(np.asarray(v))
                       for k, v in self._edge_feat.items()},
            adj_src_index=adj_src, adj_dst_index=adj_dst,
            _graph_src_node_index=conv(self._graph_src_node_index),
            _graph_dst_node_index=conv(self._graph_dst_node_index),
            _graph_edge_index=conv(self._graph_edge_index),
            _num_graph=self._num_graph, _spmm_layouts=spmm_layouts)

    def numpy(self) -> "BiGraph":
        if not self._is_tensor:
            return self
        to_np = np.asarray
        conv = lambda idx: to_np(idx) if idx is not None else None
        return BiGraph(
            to_np(self._edges), src_num_nodes=self._src_num_nodes,
            dst_num_nodes=self._dst_num_nodes,
            src_node_feat={k: to_np(v)
                           for k, v in self._src_node_feat.items()},
            dst_node_feat={k: to_np(v)
                           for k, v in self._dst_node_feat.items()},
            edge_feat={k: to_np(v) for k, v in self._edge_feat.items()},
            adj_src_index=(self._adj_src_index.numpy()
                           if self._adj_src_index is not None else None),
            adj_dst_index=(self._adj_dst_index.numpy()
                           if self._adj_dst_index is not None else None),
            _graph_src_node_index=conv(self._graph_src_node_index),
            _graph_dst_node_index=conv(self._graph_dst_node_index),
            _graph_edge_index=conv(self._graph_edge_index),
            _num_graph=self._num_graph)

    # -- batching (reference ``:1283``) --------------------------------------

    @classmethod
    def disjoint(cls, graph_list: Sequence["BiGraph"]) -> "BiGraph":
        if not graph_list:
            raise ValueError("graph_list is empty")
        is_tensor = graph_list[0]._is_tensor
        xp = jnp if is_tensor else np
        src_off = np.cumsum([0] + [g.src_num_nodes for g in graph_list])
        dst_off = np.cumsum([0] + [g.dst_num_nodes for g in graph_list])
        parts = []
        for g, so, do in zip(graph_list, src_off[:-1], dst_off[:-1]):
            e = g.edges
            # one broadcast add, offsets cast to the edge dtype so device
            # edges stay int32 (TPUs have no native int64 ALU path)
            off = np.asarray([so, do]).astype(
                e.dtype if not is_tensor else np.int32)
            parts.append(e + (jnp.asarray(off) if is_tensor else off))
        edges = xp.concatenate(parts, axis=0)
        _cat = lambda dicts: _concat_feats(dicts, xp)

        gsi = np.asarray(src_off, dtype=np.int32)
        gdi = np.asarray(dst_off, dtype=np.int32)
        gei = np.cumsum([0] + [g.num_edges for g in graph_list]).astype(
            np.int32)
        if is_tensor:
            gsi, gdi, gei = map(jnp.asarray, (gsi, gdi, gei))
        return cls(edges,
                   src_num_nodes=int(src_off[-1]),
                   dst_num_nodes=int(dst_off[-1]),
                   src_node_feat=_cat([g.src_node_feat for g in graph_list]),
                   dst_node_feat=_cat([g.dst_node_feat for g in graph_list]),
                   edge_feat=_cat([g.edge_feat for g in graph_list]),
                   _graph_src_node_index=gsi, _graph_dst_node_index=gdi,
                   _graph_edge_index=gei, _num_graph=len(graph_list))

    batch = disjoint

    # -- persistence --------------------------------------------------------

    def dump(self, path: str):
        g = self.numpy()
        os.makedirs(path, exist_ok=True)
        np.save(os.path.join(path, "edges.npy"), np.asarray(g._edges))
        meta = {"src_num_nodes": g._src_num_nodes,
                "dst_num_nodes": g._dst_num_nodes,
                "num_graph": g._num_graph}
        for name in ("_graph_src_node_index", "_graph_dst_node_index",
                     "_graph_edge_index"):
            v = getattr(g, name)
            if v is not None:
                meta[name] = np.asarray(v).tolist()
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
        for sub, feats in (("src_node_feat", g._src_node_feat),
                           ("dst_node_feat", g._dst_node_feat),
                           ("edge_feat", g._edge_feat)):
            d = os.path.join(path, sub)
            os.makedirs(d, exist_ok=True)
            for k, v in feats.items():
                np.save(os.path.join(d, f"{k}.npy"), np.asarray(v))

    @classmethod
    def load(cls, path: str, mmap_mode="r") -> "BiGraph":
        edges = np.load(os.path.join(path, "edges.npy"), mmap_mode=mmap_mode)
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        feats = {}
        for sub in ("src_node_feat", "dst_node_feat", "edge_feat"):
            d = os.path.join(path, sub)
            feats[sub] = {}
            if os.path.isdir(d):
                for fn in sorted(os.listdir(d)):
                    if fn.endswith(".npy"):
                        feats[sub][fn[:-4]] = np.load(
                            os.path.join(d, fn), mmap_mode=mmap_mode)
        extra = {name: np.asarray(meta[name], dtype=np.int64)
                 for name in ("_graph_src_node_index",
                              "_graph_dst_node_index",
                              "_graph_edge_index") if name in meta}
        return cls(edges, src_num_nodes=meta["src_num_nodes"],
                   dst_num_nodes=meta["dst_num_nodes"],
                   src_node_feat=feats["src_node_feat"],
                   dst_node_feat=feats["dst_node_feat"],
                   edge_feat=feats["edge_feat"],
                   _num_graph=meta.get("num_graph", 1), **extra)

    # -- pytree -------------------------------------------------------------

    def tree_flatten(self):
        children = (self._edges, self._src_node_feat, self._dst_node_feat,
                    self._edge_feat, self._adj_src_index,
                    self._adj_dst_index, self._graph_src_node_index,
                    self._graph_dst_node_index, self._graph_edge_index,
                    self._spmm_layouts)
        aux = (self._src_num_nodes, self._dst_num_nodes, self._num_edges,
               self._num_graph, self._is_tensor)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        (obj._edges, obj._src_node_feat, obj._dst_node_feat, obj._edge_feat,
         obj._adj_src_index, obj._adj_dst_index, obj._graph_src_node_index,
         obj._graph_dst_node_index, obj._graph_edge_index,
         obj._spmm_layouts) = children
        (obj._src_num_nodes, obj._dst_num_nodes, obj._num_edges,
         obj._num_graph, obj._is_tensor) = aux
        return obj

    def __repr__(self):
        mode = "tensor" if self._is_tensor else "numpy"
        return (f"BiGraph(src_num_nodes={self._src_num_nodes}, "
                f"dst_num_nodes={self._dst_num_nodes}, "
                f"num_edges={self._num_edges}, mode={mode})")
