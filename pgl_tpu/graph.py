"""Graph — the central dual-representation (host numpy / device jax) graph.

Capability parity with the reference ``pgl/graph.py`` ``Graph`` (construction
``:114``, lazy CSR/CSC ``:1308,1319``, degree ``:427,449``, host neighbor
queries/sampling ``:475,536,582,644``, message passing ``:694-973``, batching
``:975-1075``, persistence ``:1177-1302``, ``node_batch_iter`` ``:1369``).

TPU-native design (not a port):
  * A device ``Graph`` is an immutable **pytree of jax arrays** with static
    ``num_nodes``/``num_edges`` in the aux data, so it flows through ``jit`` /
    ``pjit`` / ``shard_map`` like any other operand.
  * Edges are additionally stored **CSC-sorted** (dst-major) at conversion
    time, so ``recv``-style aggregation is a *sorted* segment reduce — the
    reference re-sorts per call (``pgl/graph.py:821-832``); we sort once.
  * ``tensor()`` is ``device_put`` (optionally under a ``Sharding``), not
    in-place mutation; ``numpy()`` is the inverse.
  * ids are int32 on device (local reindexed), int64 allowed on host.
"""

from __future__ import annotations

import os
import json
from typing import Callable, Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from .message import Message
from .ops import message_passing as mp
from .ops import segment as S
from .utils.edge_index import EdgeIndex

__all__ = ["Graph"]


def _is_device_array(x) -> bool:
    return isinstance(x, jax.Array) or isinstance(x, jax.core.Tracer)


def _check_feat_dict(feat, name):
    if feat is None:
        return {}
    if not isinstance(feat, dict):
        raise TypeError(f"{name} must be a dict of arrays, got {type(feat)}")
    return dict(feat)


@jax.tree_util.register_pytree_node_class
class Graph:
    """A (possibly batched) directed graph with node/edge feature dicts."""

    def __init__(self, edges, num_nodes: Optional[int] = None,
                 node_feat: Optional[Dict] = None,
                 edge_feat: Optional[Dict] = None, **kwargs):
        if edges is None:
            raise ValueError("edges is required")
        is_tensor = _is_device_array(edges)
        if not is_tensor:
            edges = np.asarray(edges)
        if edges.ndim != 2 or edges.shape[1] != 2:
            raise ValueError(f"edges must be [E, 2], got {edges.shape}")
        self._edges = edges
        self._is_tensor = is_tensor
        if num_nodes is None:
            if is_tensor:
                raise ValueError(
                    "num_nodes must be given explicitly for device graphs "
                    "(it is static under jit)")
            num_nodes = int(edges.max()) + 1 if edges.size else 0
        self._num_nodes = int(num_nodes)
        self._num_edges = int(edges.shape[0])
        self._node_feat = _check_feat_dict(node_feat, "node_feat")
        self._edge_feat = _check_feat_dict(edge_feat, "edge_feat")
        # Optional prebuilt state (internal fast-path kwargs).
        self._adj_src_index = kwargs.get("adj_src_index", None)
        self._adj_dst_index = kwargs.get("adj_dst_index", None)
        # Batched-graph bookkeeping: indptr over nodes/edges per subgraph.
        self._graph_node_index = kwargs.get("_graph_node_index", None)
        self._graph_edge_index = kwargs.get("_graph_edge_index", None)
        self._num_graph = int(kwargs.get("_num_graph", 1))
        self._spmm_layouts = kwargs.get("_spmm_layouts", None)

    # ------------------------------------------------------------------
    # basic accessors
    # ------------------------------------------------------------------

    @property
    def edges(self):
        """[E, 2] (src, dst) pairs in original order."""
        return self._edges

    @property
    def num_nodes(self) -> int:
        return self._num_nodes

    @property
    def num_edges(self) -> int:
        return self._num_edges

    @property
    def num_graph(self) -> int:
        """Number of disjoint subgraphs batched into this Graph."""
        return self._num_graph

    @property
    def nodes(self):
        if self._is_tensor:
            return jnp.arange(self._num_nodes, dtype=jnp.int32)
        return np.arange(self._num_nodes)

    @property
    def node_feat(self) -> Dict:
        return self._node_feat

    @property
    def edge_feat(self) -> Dict:
        return self._edge_feat

    @property
    def is_tensor(self) -> bool:
        return self._is_tensor

    @property
    def graph_node_id(self):
        """[N] id of the subgraph each node belongs to (``pgl/graph.py:1050``)."""
        idx = self._graph_node_index
        if idx is None:
            zeros = jnp.zeros if self._is_tensor else np.zeros
            return zeros((self._num_nodes,), dtype=jnp.int32)
        return _repeat_from_indptr(idx, self._num_nodes, self._is_tensor)

    @property
    def graph_edge_id(self):
        """[E] id of the subgraph each edge belongs to (``pgl/graph.py:1075``)."""
        idx = self._graph_edge_index
        if idx is None:
            zeros = jnp.zeros if self._is_tensor else np.zeros
            return zeros((self._num_edges,), dtype=jnp.int32)
        return _repeat_from_indptr(idx, self._num_edges, self._is_tensor)

    # ------------------------------------------------------------------
    # adjacency indexes
    # ------------------------------------------------------------------

    @property
    def adj_src_index(self) -> EdgeIndex:
        """CSR: neighbors grouped by src (successors)."""
        if self._adj_src_index is None:
            self._adj_src_index = self._build_index(by="src")
        return self._adj_src_index

    @property
    def adj_dst_index(self) -> EdgeIndex:
        """CSC: neighbors grouped by dst (predecessors) — the recv layout."""
        if self._adj_dst_index is None:
            self._adj_dst_index = self._build_index(by="dst")
        return self._adj_dst_index

    def _build_index(self, by: str) -> EdgeIndex:
        src, dst = self._edges[:, 0], self._edges[:, 1]
        u, v = (src, dst) if by == "src" else (dst, src)
        if self._is_tensor:
            return EdgeIndex.from_edges_device(u, v, self._num_nodes)
        return EdgeIndex.from_edges(u, v, self._num_nodes)

    def sorted_edges(self, sort_by: str = "src"):
        """(src, dst, eid) sorted by the requested endpoint
        (``pgl/graph.py:392``)."""
        if sort_by == "src":
            idx = self.adj_src_index
            return idx.sorted_u, idx.sorted_v, idx.sorted_eid
        idx = self.adj_dst_index
        return idx.sorted_v, idx.sorted_u, idx.sorted_eid

    # ------------------------------------------------------------------
    # degree
    # ------------------------------------------------------------------

    def indegree(self, nodes=None):
        deg = self.adj_dst_index.degree
        if nodes is None:
            return deg
        take = jnp.take if self._is_tensor else lambda a, i, axis: np.asarray(a)[i]
        return take(deg, nodes, axis=0)

    def outdegree(self, nodes=None):
        deg = self.adj_src_index.degree
        if nodes is None:
            return deg
        take = jnp.take if self._is_tensor else lambda a, i, axis: np.asarray(a)[i]
        return take(deg, nodes, axis=0)

    # ------------------------------------------------------------------
    # host-side neighbor queries (numpy mode; ``pgl/graph.py:475-693``)
    # ------------------------------------------------------------------

    def _require_numpy(self, what):
        if self._is_tensor:
            raise ValueError(f"{what} is a host-side query; call .numpy() first")

    def successor(self, nodes=None, return_eids: bool = False):
        self._require_numpy("successor")
        idx = self.adj_src_index
        if return_eids:
            return idx.view_v(nodes), idx.view_eid(nodes)
        return idx.view_v(nodes)

    def predecessor(self, nodes=None, return_eids: bool = False):
        self._require_numpy("predecessor")
        idx = self.adj_dst_index
        if return_eids:
            return idx.view_v(nodes), idx.view_eid(nodes)
        return idx.view_v(nodes)

    def sample_successor(self, nodes, max_degree, return_eids: bool = False,
                         seed: int = 0):
        self._require_numpy("sample_successor")
        return _sample_from_index(self.adj_src_index, nodes, max_degree,
                                  return_eids, seed)

    def sample_predecessor(self, nodes, max_degree, return_eids: bool = False,
                           seed: int = 0):
        self._require_numpy("sample_predecessor")
        return _sample_from_index(self.adj_dst_index, nodes, max_degree,
                                  return_eids, seed)

    # ------------------------------------------------------------------
    # message passing (device mode; ``pgl/graph.py:694-973``)
    # ------------------------------------------------------------------

    def _require_tensor(self):
        if not self._is_tensor:
            raise ValueError("You must call Graph.tensor() first")

    def send(self, message_func: Callable, src_feat=None, dst_feat=None,
             edge_feat=None, node_feat=None) -> Dict:
        """UDF message: gather endpoint rows, apply ``message_func`` per edge.

        ``message_func(src_feat, dst_feat, edge_feat)`` receives dicts of
        ``[E, ...]`` tensors and returns a dict of ``[E, ...]`` messages.
        """
        self._require_tensor()
        if (src_feat is not None or dst_feat is not None) \
                and node_feat is not None:
            raise ValueError(
                "Can not use src/dst feat and node feat at the same time")
        src_in = dict(node_feat or {}) if node_feat is not None \
            else dict(src_feat or {})
        dst_in = dict(node_feat or {}) if node_feat is not None \
            else dict(dst_feat or {})
        src, dst = self._edges[:, 0], self._edges[:, 1]
        gathered_src = {k: mp.gather_rows(v, src) for k, v in src_in.items()}
        gathered_dst = {k: mp.gather_rows(v, dst) for k, v in dst_in.items()}
        msg = message_func(gathered_src, gathered_dst, dict(edge_feat or {}))
        if not isinstance(msg, dict):
            raise TypeError("message_func must return a dict of tensors")
        return msg

    def recv(self, reduce_func, msg: Dict, recv_mode: str = "dst"):
        """Aggregate per-edge messages into per-node outputs.

        ``reduce_func`` may be a string ('sum'/'mean'/'max'/'min') applied to
        every entry, or a UDF over a :class:`Message`. Nodes receiving no
        message produce zeros (reference contract ``pgl/graph.py:806-808``).
        """
        self._require_tensor()
        if not isinstance(msg, dict):
            raise TypeError("msg must be a dict")
        index = self.adj_dst_index if recv_mode == "dst" else self.adj_src_index
        bucketed = Message(msg, index.segment_ids, self._num_nodes,
                           eid=index.sorted_eid, indices_are_sorted=True)
        if callable(reduce_func):
            return reduce_func(bucketed)
        return {k: bucketed.reduce(bucketed[k], reduce_func) for k in msg} \
            if len(msg) > 1 else bucketed.reduce(bucketed[next(iter(msg))],
                                                 reduce_func)

    def send_recv(self, feature, reduce_func: str = "sum"):
        """Fused copy-send + built-in reduce (``pgl/graph.py:834-887``)."""
        return self.send_u_recv(feature, reduce_op=reduce_func)

    def send_u_recv(self, feature, reduce_op: str = "sum"):
        """SpMM: out[d] = reduce over incoming edges of feature[s].

        sum/mean ride the Pallas one-hot-MXU kernel on TPU backends
        (``ops/pallas/segment_kernels.py``); max/min and non-CSC graphs use
        the XLA segment path.
        """
        self._require_tensor()
        if self._adj_dst_index is not None:
            idx = self._adj_dst_index
            if reduce_op in ("sum", "mean"):
                from .ops.dispatch import use_pallas_spmm
                if self._spmm_layouts is not None \
                        and use_pallas_spmm(feature, self._num_edges):
                    from .ops.pallas.segment_kernels import spmm
                    csc, csr = self._spmm_layouts[:2]
                    dedup = self._dedup_layouts()

                    def run(f):
                        if dedup is not None:
                            from .ops.pallas.dedup_kernels import (
                                spmm_dedup, NBD_DEFAULT, ETD_DEFAULT)
                            # positional w = layout's own window width (the
                            # layout may be built with a non-default W via
                            # PGL_TPU_DEDUP_W)
                            return spmm_dedup(f, dedup[0], dedup[1],
                                              NBD_DEFAULT, ETD_DEFAULT,
                                              dedup[0].w)
                        return spmm(f, csc, csr)

                    d = feature.shape[1]
                    if d % 128:
                        # zero-pad narrow features to the lane width: the
                        # gather is row-count-bound, so padding is ~free
                        # compared to falling back to the XLA scatter.
                        # The barrier pins the pad on the [N, d] side —
                        # XLA otherwise commutes it past the kernel's
                        # uniq gather and pads the (larger) [Upad, d]
                        # gathered buffer instead (trace-measured +0.4 ms
                        # per narrow SpMM at 2M edges)
                        pad = (-d) % 128
                        fpad = jax.lax.optimization_barrier(
                            jnp.concatenate(
                                [feature,
                                 jnp.zeros((feature.shape[0], pad),
                                           feature.dtype)], axis=1))
                        out = run(fpad)[:, :d]
                    else:
                        out = run(feature)
                else:
                    out = S.segment_sum(
                        mp.gather_rows(feature, idx.sorted_v),
                        idx.segment_ids, num_segments=self._num_nodes,
                        indices_are_sorted=True)
                if reduce_op == "mean":
                    deg = jnp.maximum(idx.degree, 1).astype(out.dtype)
                    out = out / deg[:, None]
                return out
            return S.segment_pool(
                mp.gather_rows(feature, idx.sorted_v), idx.segment_ids,
                reduce_op, num_segments=self._num_nodes,
                indices_are_sorted=True)
        return mp.send_u_recv(feature, self._edges[:, 0], self._edges[:, 1],
                              num_nodes=self._num_nodes, reduce_op=reduce_op)

    def send_ue_recv(self, feature, edge_feat, message_op: str = "mul",
                     reduce_op: str = "sum"):
        """Edge-weighted SpMM (``pgl/graph.py:889-937``).

        Scalar edge weights with mul/sum ride the weighted Pallas kernel on
        TPU backends (dx via the transposed weighted SpMM, dw via SDDMM).
        """
        self._require_tensor()
        ew = edge_feat
        scalar_w = (ew.ndim == 1 or (ew.ndim == 2 and ew.shape[1] == 1))
        d = feature.shape[1]
        # vector/per-head edge features ride the fused base kernel when
        # the head width divides the (unpadded) lane-aligned feature dim —
        # reference parity: fused send_ue_recv for any tensor edge feat
        # (pgl/graph.py:930)
        vector_w = (ew.ndim == 2 and ew.shape[1] > 1 and d % 128 == 0
                    and d % ew.shape[1] == 0)
        if ((scalar_w or vector_w) and message_op in ("mul", "add")
                and reduce_op == "sum"
                and self._spmm_layouts is not None):
            from .ops.dispatch import use_pallas_spmm
            if use_pallas_spmm(feature, self._num_edges):
                from .ops.pallas.segment_kernels import spmm_weighted
                csc, csr = self._spmm_layouts[:2]
                if scalar_w:
                    w = ew.reshape(-1).astype(feature.dtype)
                else:
                    w = ew.astype(feature.dtype)
                w_csc_e = jnp.take(w, self.adj_dst_index.sorted_eid,
                                   axis=0)
                w_csr_e = jnp.take(w, self.adj_src_index.sorted_eid,
                                   axis=0)
                dedup = self._dedup_layouts() if (
                    scalar_w and message_op == "mul") else None
                E = self._num_edges

                def run(f):
                    if dedup is not None:
                        from .ops.pallas.dedup_kernels import (
                            spmm_dedup_weighted, NBD_DEFAULT, ETD_DEFAULT)
                        csc_d, csr_d = dedup
                        wd_csc = jnp.zeros(
                            csc_d.padded_v.shape[0], f.dtype
                        ).at[:E].set(jnp.take(w_csc_e, csc_d.eid))
                        wd_csr = jnp.zeros(
                            csr_d.padded_v.shape[0], f.dtype
                        ).at[:E].set(jnp.take(w_csr_e, csr_d.eid))
                        return spmm_dedup_weighted(f, wd_csc, wd_csr,
                                                   csc_d, csr_d,
                                                   NBD_DEFAULT, ETD_DEFAULT,
                                                   csc_d.w)
                    def wshape(lay):
                        return (lay.padded_v.shape[0],) + w.shape[1:]
                    w_csc = jnp.zeros(wshape(csc), f.dtype
                                      ).at[:E].set(w_csc_e)
                    w_csr = jnp.zeros(wshape(csr), f.dtype
                                      ).at[:E].set(w_csr_e)
                    from .ops.pallas.segment_kernels import (
                        NB_DEFAULT, ET_DEFAULT)
                    return spmm_weighted(f, w_csc, w_csr, csc, csr,
                                         NB_DEFAULT, ET_DEFAULT, False,
                                         message_op)

                if d % 128:
                    pad = (-d) % 128
                    fpad = jnp.concatenate(
                        [feature, jnp.zeros((feature.shape[0], pad),
                                            feature.dtype)], axis=1)
                    return run(fpad)[:, :d]
                return run(feature)
        if self._adj_dst_index is not None:
            idx = self._adj_dst_index
            ef = jnp.take(edge_feat, idx.sorted_eid, axis=0)
            msg = mp._COMBINE[message_op](
                mp.gather_rows(feature, idx.sorted_v),
                mp._broadcast_edge(ef, feature.ndim))
            return S.segment_pool(msg, idx.segment_ids, reduce_op,
                                  num_segments=self._num_nodes,
                                  indices_are_sorted=True)
        return mp.send_ue_recv(feature, edge_feat, self._edges[:, 0],
                               self._edges[:, 1], num_nodes=self._num_nodes,
                               message_op=message_op, reduce_op=reduce_op)

    def send_uv(self, src_feat, dst_feat, message_op: str = "add"):
        """SDDMM: per-edge combine of endpoint rows (``pgl/graph.py:939``)."""
        self._require_tensor()
        return mp.send_uv(src_feat, dst_feat, self._edges[:, 0],
                          self._edges[:, 1], message_op=message_op)

    def sddmm_csc(self, src_feat, dst_feat, message_op: str = "mul",
                  interpret: bool = False, layout=None):
        """Fused dedup SDDMM (``ops/pallas/sddmm_kernels.py``): per-edge
        endpoint combine at ~4× the XLA ``send_uv`` rate at 2M edges.

        Returns scores in the layout's **slot order** (dedup edge order
        — dst-block-major like CSC; pads are 0). Downstream per-dst
        consumers (edge softmax, attention) read this order natively;
        map individual edges back with ``g.sddmm_layout().eid`` (slot →
        CSC edge position, host-side). ``send_uv`` keeps the reference's
        original-edge-order contract (``pgl/graph.py:939``) on the XLA
        path. The layout build is a host-side O(E log E) pass cached on
        the graph OBJECT (not the pytree) — under jit, build it outside
        with ``g.sddmm_layout()`` and pass it via ``layout=``."""
        lay = layout if layout is not None else self.sddmm_layout()
        if lay is None:                 # empty graph
            D = src_feat.shape[1:]
            return jnp.zeros((0,) + tuple(D), jnp.float32)
        from .ops.pallas import sddmm_kernels as sk
        if not interpret and jax.default_backend() != "tpu":
            # same slot-order contract off-TPU (interpret mode is far
            # too slow at real sizes; gathers are fine on CPU)
            return sk.sddmm_xla_slots(src_feat, dst_feat, lay,
                                      message_op)
        return sk.sddmm_dedup(src_feat, dst_feat, lay, message_op,
                              interpret)

    def sddmm_layout(self):
        """Build (once, host-side) and cache the dedup SDDMM layout."""
        self._require_tensor()
        if not hasattr(self, "_sddmm_layout_cache"):
            from .ops.pallas.sddmm_kernels import build_sddmm_layout
            idx = self.adj_dst_index
            self._sddmm_layout_cache = build_sddmm_layout(
                np.asarray(idx.indptr), np.asarray(idx.sorted_v),
                self._num_nodes)
        return self._sddmm_layout_cache

    def streamed_send_u_recv(self, feature_host, reduce_op: str = "sum",
                             chunk_rows: int = 1 << 18,
                             interpret: bool = False):
        """UVA analog (``Graph.tensor(uva=True)``, ``pgl/graph.py:227-247``):
        SpMM with a HOST-resident feature table (numpy or memmap) that
        never fits — or never needs to fit — in HBM. Runs dst-range by
        dst-range, staging only each chunk's unique source rows to the
        device and writing finished rows back to the host; the next
        chunk's staging overlaps the current kernel. Call on the numpy
        form; returns a host array.
        """
        g = self.numpy() if self._is_tensor else self
        key = (int(chunk_rows), bool(interpret))
        cache = getattr(g, "_streamed_spmm_cache", None)
        if cache is None or cache[0] != key:
            from .ops.pallas.streaming import StreamedSpMM
            idx = g.adj_dst_index
            sp = StreamedSpMM(np.asarray(idx.indptr),
                              np.asarray(idx.sorted_v), g.num_nodes,
                              chunk_rows=chunk_rows, interpret=interpret)
            g._streamed_spmm_cache = cache = (key, sp)
        out = cache[1](np.asarray(feature_host))
        if reduce_op == "mean":
            deg = np.maximum(np.asarray(g.adj_dst_index.degree), 1)
            out = out / deg[:, None].astype(out.dtype)
        elif reduce_op != "sum":
            raise NotImplementedError(
                "streamed path supports sum/mean (the dedup kernel is a "
                "sum machine; stage max/min through the device path)")
        return out

    # ------------------------------------------------------------------
    # conversion
    # ------------------------------------------------------------------

    def tensor(self, sharding=None, build_adj: bool = True) -> "Graph":
        """Device copy: ids → int32, features → jax arrays, CSR/CSC prebuilt.

        Unlike the reference (in-place mutation at ``pgl/graph.py:227``) this
        returns a new immutable Graph; pass a ``jax.sharding.Sharding`` to
        place the arrays under a mesh.
        """
        if self._is_tensor:
            return self
        put = (lambda x: jax.device_put(x, sharding)) if sharding \
            else jnp.asarray
        if build_adj:
            adj_src = self.adj_src_index.tensor(sharding)
            adj_dst = self.adj_dst_index.tensor(sharding)
            spmm_layouts = self._build_spmm_layouts()
        else:
            spmm_layouts = None
            adj_src = (self._adj_src_index.tensor(sharding)
                       if self._adj_src_index is not None else None)
            adj_dst = (self._adj_dst_index.tensor(sharding)
                       if self._adj_dst_index is not None else None)
        return Graph(
            put(np.asarray(self._edges, dtype=np.int32)),
            num_nodes=self._num_nodes,
            node_feat={k: put(np.asarray(v)) for k, v in self._node_feat.items()},
            edge_feat={k: put(np.asarray(v)) for k, v in self._edge_feat.items()},
            adj_src_index=adj_src, adj_dst_index=adj_dst,
            _graph_node_index=(put(np.asarray(self._graph_node_index,
                                              dtype=np.int32))
                               if self._graph_node_index is not None else None),
            _graph_edge_index=(put(np.asarray(self._graph_edge_index,
                                              dtype=np.int32))
                               if self._graph_edge_index is not None else None),
            _num_graph=self._num_graph,
            _spmm_layouts=spmm_layouts)

    def _build_spmm_layouts(self):
        """Host-side build of the Pallas SpMM layouts (CSC for forward,
        CSR for the transposed backward); see ops/pallas/segment_kernels."""
        from .ops.pallas.segment_kernels import build_blocked_layout
        dst_idx = self.adj_dst_index
        src_idx = self.adj_src_index
        # Above the chunk threshold the SpMM runs chunk-by-chunk so the
        # gathered [E, D] message buffer never exceeds ~chunk_edges rows —
        # keeps HBM bounded for 16M+-edge graphs (PGL_TPU_SPMM_CHUNK_EDGES
        # overrides; 0 disables).
        import os
        chunk_thresh = int(os.environ.get("PGL_TPU_SPMM_CHUNK_EDGES",
                                          4 * 1024 * 1024))
        chunk = chunk_thresh if (chunk_thresh
                                 and self._num_edges > chunk_thresh) else 0
        csc = build_blocked_layout(np.asarray(dst_idx.indptr),
                                   np.asarray(dst_idx.sorted_v),
                                   self._num_nodes, chunk_edges=chunk)
        csr = build_blocked_layout(np.asarray(src_idx.indptr),
                                   np.asarray(src_idx.sorted_v),
                                   self._num_nodes, chunk_edges=chunk)
        # for each CSR edge position, its CSC position (gather spec used by
        # the transposed backward passes: w_csr = w_csc[perm])
        inv_csc = np.empty(self._num_edges, dtype=np.int64)
        inv_csc[np.asarray(dst_idx.sorted_eid)] = np.arange(self._num_edges)
        perm = jnp.asarray(
            inv_csc[np.asarray(src_idx.sorted_eid)].astype(np.int32))

        # two-phase unique-src layouts: gather each distinct src once per
        # dst row block instead of once per edge (measured 3.7x SpMM fwd on
        # the 2M-edge bench graph, experiments/unique_dedup/). Built when
        # the graph is big enough that the gather floor dominates.
        csc_d = csr_d = None
        if os.environ.get("PGL_TPU_DEDUP", "1") != "0":
            min_e = int(os.environ.get("PGL_TPU_DEDUP_MIN_EDGES", 262144))
            max_e = int(os.environ.get("PGL_TPU_DEDUP_MAX_EDGES",
                                       64 * 1024 * 1024))
            if min_e <= self._num_edges <= max_e:
                from .ops.pallas.dedup_kernels import (build_dedup_layout,
                                                       W_DEFAULT)
                # skip near-regular graphs where blocks see no src
                # repetition (the kernel would pay its inner matmul for a
                # ~1x gather); 0.55 ≈ break-even from the A/B sweep
                # PGL_TPU_DEDUP_W: opt-in rank-window width override
                # (perf probes; must be a multiple of 128)
                dw = int(os.environ.get("PGL_TPU_DEDUP_W", W_DEFAULT))
                csc_d = build_dedup_layout(np.asarray(dst_idx.indptr),
                                           np.asarray(dst_idx.sorted_v),
                                           self._num_nodes, w=dw,
                                           max_ratio=0.55)
                csr_d = build_dedup_layout(np.asarray(src_idx.indptr),
                                           np.asarray(src_idx.sorted_v),
                                           self._num_nodes, w=dw,
                                           max_ratio=0.55
                                           ) if csc_d is not None else None
                if csr_d is None:
                    csc_d = None
        red = None
        if csc_d is not None:
            # uniq→node sorted reduce for the dedup attention backward
            # (ops/pallas/dedup_attention.py) — host build needs numpy,
            # so it happens here, not under a trace
            from .ops.pallas.dedup_attention import build_uniq_reduce
            red = build_uniq_reduce(csc_d, self._num_nodes)
        if csc_d is not None and jax.default_backend() == "tpu":
            # Materialize the structural count matrices once (one device
            # pass each): every dedup SpMM / attention fwd / attention bwd
            # call then DMAs C[NB, W] per pair instead of re-running the
            # ~1-2 µs/pair count pass. HBM cost ≈ 33 B/edge per layout,
            # so gate by a budget (and bf16 exactness, inside
            # materialize_counts).
            from .ops.pallas.dedup_kernels import (materialize_counts,
                                                   NBD_DEFAULT)
            budget = float(os.environ.get("PGL_TPU_COUNTS_BUDGET_MB",
                                          512)) * 1e6
            nbytes = sum(int(lay.pair_ts.shape[0]) * NBD_DEFAULT * lay.w * 2
                         for lay in (csc_d, csr_d))
            if nbytes <= budget:
                csc_d = materialize_counts(csc_d)
                csr_d = materialize_counts(csr_d)
        return (csc, csr, perm, csc_d, csr_d, red)

    def _dedup_layouts(self):
        """(csc_d, csr_d) when the two-phase unique-src layouts were built
        and we're on a TPU backend, else None."""
        lays = self._spmm_layouts
        if (lays is None or len(lays) < 5 or lays[3] is None
                or jax.default_backend() != "tpu"):
            return None
        return lays[3], lays[4]

    def _dedup_attn_aux(self):
        """(csc_d, uniq_reduce_layout) for the count-matrix attention
        kernel, or None."""
        lays = self._spmm_layouts
        if (lays is None or len(lays) < 6 or lays[3] is None
                or lays[5] is None or jax.default_backend() != "tpu"):
            return None
        return lays[3], lays[5]

    def numpy(self) -> "Graph":
        if not self._is_tensor:
            return self
        to_np = lambda x: np.asarray(x)
        return Graph(
            to_np(self._edges), num_nodes=self._num_nodes,
            node_feat={k: to_np(v) for k, v in self._node_feat.items()},
            edge_feat={k: to_np(v) for k, v in self._edge_feat.items()},
            adj_src_index=(self._adj_src_index.numpy()
                           if self._adj_src_index is not None else None),
            adj_dst_index=(self._adj_dst_index.numpy()
                           if self._adj_dst_index is not None else None),
            _graph_node_index=(to_np(self._graph_node_index)
                               if self._graph_node_index is not None else None),
            _graph_edge_index=(to_np(self._graph_edge_index)
                               if self._graph_edge_index is not None else None),
            _num_graph=self._num_graph)

    # ------------------------------------------------------------------
    # batching (``pgl/graph.py:975-1075``)
    # ------------------------------------------------------------------

    @classmethod
    def disjoint(cls, graph_list: Sequence["Graph"]) -> "Graph":
        """Merge graphs into one block-diagonal graph with id offsets."""
        if not graph_list:
            raise ValueError("graph_list is empty")
        is_tensor = graph_list[0]._is_tensor
        xp = jnp if is_tensor else np
        node_offsets = np.cumsum([0] + [g.num_nodes for g in graph_list])
        edge_counts = [g.num_edges for g in graph_list]
        edges = xp.concatenate([
            g.edges + np.int32(off) if is_tensor else g.edges + off
            for g, off in zip(graph_list, node_offsets[:-1])], axis=0)
        node_feat = _concat_feats([g.node_feat for g in graph_list], xp)
        edge_feat = _concat_feats([g.edge_feat for g in graph_list], xp)
        gni = np.cumsum([0] + [g.num_nodes for g in graph_list]).astype(np.int32)
        gei = np.cumsum([0] + edge_counts).astype(np.int32)
        if is_tensor:
            gni, gei = jnp.asarray(gni), jnp.asarray(gei)
        return cls(edges, num_nodes=int(node_offsets[-1]),
                   node_feat=node_feat, edge_feat=edge_feat,
                   _graph_node_index=gni, _graph_edge_index=gei,
                   _num_graph=len(graph_list))

    batch = disjoint

    # ------------------------------------------------------------------
    # iteration / persistence
    # ------------------------------------------------------------------

    def node_batch_iter(self, batch_size: int, shuffle: bool = True,
                        seed: Optional[int] = None):
        """Yield node-id batches (``pgl/graph.py:1369``). Host-side."""
        nodes = np.arange(self._num_nodes)
        if shuffle:
            np.random.default_rng(seed).shuffle(nodes)
        for start in range(0, self._num_nodes, batch_size):
            yield nodes[start:start + batch_size]

    def dump(self, path: str):
        """Persist as a directory of .npy files (``pgl/graph.py:1177``)."""
        g = self.numpy()
        os.makedirs(path, exist_ok=True)
        np.save(os.path.join(path, "edges.npy"), np.asarray(g._edges))
        meta = {"num_nodes": g._num_nodes, "num_graph": g._num_graph}
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
        for sub, feats in (("node_feat", g._node_feat),
                           ("edge_feat", g._edge_feat)):
            d = os.path.join(path, sub)
            os.makedirs(d, exist_ok=True)
            for k, v in feats.items():
                np.save(os.path.join(d, f"{k}.npy"), np.asarray(v))
        if g._adj_src_index is not None:
            g._adj_src_index.dump(os.path.join(path, "adj_src"))
        if g._adj_dst_index is not None:
            g._adj_dst_index.dump(os.path.join(path, "adj_dst"))
        if g._graph_node_index is not None:
            np.save(os.path.join(path, "graph_node_index.npy"),
                    np.asarray(g._graph_node_index))
            np.save(os.path.join(path, "graph_edge_index.npy"),
                    np.asarray(g._graph_edge_index))

    def to_mmap(self, path: str) -> "Graph":
        """Dump then reload memory-mapped — zero-copy sharing across
        processes (reference ``pgl/graph.py:1297``)."""
        self.dump(path)
        return Graph.load(path, mmap_mode="r")

    @classmethod
    def load(cls, path: str, mmap_mode: Optional[str] = "r") -> "Graph":
        """Load a dumped graph, lazily via mmap (``pgl/graph.py:1243``)."""
        edges = np.load(os.path.join(path, "edges.npy"), mmap_mode=mmap_mode)
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        feats = {}
        for sub in ("node_feat", "edge_feat"):
            d = os.path.join(path, sub)
            feats[sub] = {}
            if os.path.isdir(d):
                for fn in sorted(os.listdir(d)):
                    if fn.endswith(".npy"):
                        feats[sub][fn[:-4]] = np.load(os.path.join(d, fn),
                                                      mmap_mode=mmap_mode)
        kwargs = {}
        for name, key in (("adj_src", "adj_src_index"),
                          ("adj_dst", "adj_dst_index")):
            d = os.path.join(path, name)
            if os.path.isdir(d):
                kwargs[key] = EdgeIndex.load(d, mmap_mode=mmap_mode)
        gni = os.path.join(path, "graph_node_index.npy")
        if os.path.exists(gni):
            kwargs["_graph_node_index"] = np.load(gni, mmap_mode=mmap_mode)
            kwargs["_graph_edge_index"] = np.load(
                os.path.join(path, "graph_edge_index.npy"),
                mmap_mode=mmap_mode)
            kwargs["_num_graph"] = len(kwargs["_graph_node_index"]) - 1
        return cls(edges, num_nodes=meta["num_nodes"],
                   node_feat=feats["node_feat"], edge_feat=feats["edge_feat"],
                   **kwargs)

    # ------------------------------------------------------------------
    # pytree protocol
    # ------------------------------------------------------------------

    def tree_flatten(self):
        children = (self._edges, self._node_feat, self._edge_feat,
                    self._adj_src_index, self._adj_dst_index,
                    self._graph_node_index, self._graph_edge_index,
                    self._spmm_layouts)
        aux = (self._num_nodes, self._num_edges, self._num_graph,
               self._is_tensor)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        (obj._edges, obj._node_feat, obj._edge_feat, obj._adj_src_index,
         obj._adj_dst_index, obj._graph_node_index,
         obj._graph_edge_index, obj._spmm_layouts) = children
        (obj._num_nodes, obj._num_edges, obj._num_graph,
         obj._is_tensor) = aux
        return obj

    def __repr__(self):
        mode = "tensor" if self._is_tensor else "numpy"
        return (f"Graph(num_nodes={self._num_nodes}, "
                f"num_edges={self._num_edges}, num_graph={self._num_graph}, "
                f"mode={mode}, node_feat={list(self._node_feat)}, "
                f"edge_feat={list(self._edge_feat)})")


# ----------------------------------------------------------------------
# helpers
# ----------------------------------------------------------------------

def _repeat_from_indptr(indptr, total, is_tensor):
    """[total] segment ids from an indptr — jit-safe via searchsorted."""
    if is_tensor:
        pos = jnp.arange(total, dtype=jnp.int32)
        return (jnp.searchsorted(indptr, pos, side="right") - 1).astype(jnp.int32)
    indptr = np.asarray(indptr)
    counts = np.diff(indptr)
    return np.repeat(np.arange(len(counts), dtype=np.int32), counts)


def _concat_feats(feat_dicts, xp):
    keys = set(feat_dicts[0].keys())
    for fd in feat_dicts[1:]:
        keys &= set(fd.keys())
    return {k: xp.concatenate([fd[k] for fd in feat_dicts], axis=0)
            for k in sorted(keys)}


def _sample_from_index(index: EdgeIndex, nodes, max_degree, return_eids, seed):
    from .native import graph_kernel as native
    nodes = np.asarray(nodes).reshape(-1)
    out_indptr, out_v, out_eid = native.sample_subset_with_eid(
        np.asarray(index.indptr), np.asarray(index.sorted_v),
        np.asarray(index.sorted_eid), nodes, max_degree, seed)
    neighbors = [out_v[out_indptr[i]:out_indptr[i + 1]]
                 for i in range(len(nodes))]
    if return_eids:
        eids = [out_eid[out_indptr[i]:out_indptr[i + 1]]
                for i in range(len(nodes))]
        return neighbors, eids
    return neighbors
