"""Edge-partitioned multi-device graphs — the TPU-native replacement for the
reference's ``DistGPUGraph`` (``pgl/graph.py:1410-1553``).

The reference shards edges by ``dst % world_size`` across GPU ranks,
replicates node features, computes per-rank partial aggregations, and
all-reduces them through a differentiable NCCL allreduce
(``pgl/utils/op.py:90-122``). Here the same math is **one program, sharded**:

  * Edges are partitioned on host (contiguous dst ranges by default — better
    locality than modulo: every partial sum row a shard produces lands in its
    own dst range, and padding is bounded) and padded to a common length so
    the stacked ``[num_shards, E_pad, 2]`` array shards over a 1-D mesh axis.
  * Aggregation runs under ``shard_map``: each device does a local masked
    SpMM over its edge shard, then a single ``jax.lax.psum`` over the mesh
    axis combines partial node outputs over ICI. ``psum`` is differentiable
    by construction — the reference needed a hand-written allreduce VJP.
  * Features can be replicated (DistGPUGraph semantics) while gradients of
    the loss w.r.t. features flow correctly through psum.

``num_nodes`` stays global; every device produces the full ``[N, d]`` output
(matching the reference contract where every rank holds all node outputs).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

__all__ = ["ShardedGraph", "shard_edges"]


def shard_edges(edges: np.ndarray, num_shards: int, num_nodes: int,
                strategy: str = "dst_range",
                edge_feat: Optional[dict] = None):
    """Partition edges into ``num_shards`` padded groups.

    Returns ``(stacked_edges [S, E_pad, 2], mask [S, E_pad], perm)`` where
    ``perm`` maps stacked order back to original edge ids (for edge feats).

    strategy:
      * ``dst_range``  — contiguous dst blocks (default; partial outputs are
        localized, padding bounded by degree skew across blocks)
      * ``dst_mod``    — ``dst % num_shards`` (the reference's scheme,
        ``pgl/graph.py:1475``)
      * ``round_robin``— edge id striping (perfect balance, no locality)
    """
    edges = np.asarray(edges)
    E = edges.shape[0]
    if strategy == "dst_mod":
        assign = edges[:, 1] % num_shards
    elif strategy == "round_robin":
        assign = np.arange(E) % num_shards
    elif strategy == "dst_range":
        bound = (num_nodes + num_shards - 1) // num_shards
        assign = np.minimum(edges[:, 1] // max(bound, 1), num_shards - 1)
    else:
        raise ValueError(f"unknown strategy {strategy}")
    # stable sort by (shard, dst): within a shard edges are CSC-sorted so
    # the per-shard Pallas SpMM layout applies directly
    order = np.lexsort((edges[:, 1], assign))
    counts = np.bincount(assign, minlength=num_shards)
    e_pad = int(counts.max()) if E else 1
    # Round up so the per-device edge count is lane-aligned.
    e_pad = ((e_pad + 127) // 128) * 128
    stacked = np.zeros((num_shards, e_pad, 2), dtype=np.int32)
    mask = np.zeros((num_shards, e_pad), dtype=np.float32)
    perm = np.zeros((num_shards, e_pad), dtype=np.int32)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    for s in range(num_shards):
        idx = order[offsets[s]:offsets[s + 1]]
        k = len(idx)
        stacked[s, :k] = edges[idx]
        mask[s, :k] = 1.0
        perm[s, :k] = idx
    return stacked, mask, perm


@jax.tree_util.register_pytree_node_class
class ShardedGraph:
    """A graph whose edges are partitioned across a 1-D mesh axis.

    Construct on host with :meth:`from_graph`, then call the fused ops inside
    (or outside — they self-wrap in shard_map) a pjit region.
    """

    def __init__(self, edges, mask, perm, num_nodes: int, mesh: Mesh,
                 axis: str, node_feat=None, edge_feat=None,
                 perm_scope: str = "global"):
        self.edges = edges            # [S, E_pad, 2] int32, sharded on axis
        self.mask = mask              # [S, E_pad] f32 1=valid
        self.perm = perm              # [S, E_pad] int32 original eid
        self._num_nodes = int(num_nodes)
        self.mesh = mesh
        self.axis = axis
        self.node_feat = node_feat or {}
        self.edge_feat = edge_feat or {}
        self._shard_layouts = None
        # "global": perm indexes the original whole-graph edge order;
        # "local": perm indexes each shard's own pre-sort order (multi-host
        # construction, where no global edge order exists on any one host).
        self.perm_scope = perm_scope

    # -- construction -------------------------------------------------------

    @classmethod
    def from_graph(cls, graph, mesh: Mesh, axis: str = "edge",
                   strategy: str = "dst_range") -> "ShardedGraph":
        """Partition a host (numpy) Graph over ``mesh[axis]``; node features
        are replicated, edge features follow their edges."""
        num_shards = mesh.shape[axis]
        g = graph.numpy() if graph.is_tensor else graph
        stacked, mask, perm = shard_edges(
            np.asarray(g.edges), num_shards, g.num_nodes, strategy)
        edge_sharding = NamedSharding(mesh, P(axis, None, None))
        mask_sharding = NamedSharding(mesh, P(axis, None))
        rep = NamedSharding(mesh, P())
        node_feat = {k: jax.device_put(np.asarray(v), rep)
                     for k, v in g.node_feat.items()}
        edge_feat = {}
        for k, v in g.edge_feat.items():
            v = np.asarray(v)
            gathered = v[perm.reshape(-1)].reshape(perm.shape + v.shape[1:])
            spec = P(axis, None) if v.ndim == 1 else P(axis, None, None)
            edge_feat[k] = jax.device_put(gathered, NamedSharding(mesh, spec))
        obj = cls(
            jax.device_put(stacked, edge_sharding),
            jax.device_put(mask, mask_sharding),
            jax.device_put(perm, mask_sharding),
            g.num_nodes, mesh, axis, node_feat, edge_feat)
        obj._build_shard_layouts(stacked, mask)
        return obj

    def _build_shard_layouts(self, stacked, mask):
        """Per-shard Pallas SpMM layouts (edges are dst-sorted within each
        shard), stacked on the shard axis so shard_map slices them."""
        from ..ops.pallas.segment_kernels import build_blocked_layout
        S, E_pad, _ = stacked.shape
        N = self._num_nodes
        pv, pid, ts, te = [], [], [], []
        for s_i in range(S):
            k = int(mask[s_i].sum())
            dst = stacked[s_i, :k, 1].astype(np.int64)
            src = stacked[s_i, :k, 0].astype(np.int64)
            indptr = np.concatenate(
                [[0], np.cumsum(np.bincount(dst, minlength=N))])
            lay = build_blocked_layout(indptr, src, N)
            pv.append(np.asarray(lay.padded_v))
            pid.append(np.asarray(lay.padded_ids))
            ts.append(np.asarray(lay.tile_starts))
            te.append(np.asarray(lay.tile_ends))
        ep_max = max(len(x) for x in pv)
        n_pad = (N + 255) // 256 * 256
        pv = np.stack([np.pad(x, (0, ep_max - len(x))) for x in pv])
        pid = np.stack([np.pad(x.reshape(-1), (0, ep_max - x.size),
                               constant_values=n_pad).reshape(-1, 128)
                        for x in pid])
        ts = np.stack(ts)
        te = np.stack(te)
        sh2 = NamedSharding(self.mesh, P(self.axis, None))
        sh3 = NamedSharding(self.mesh, P(self.axis, None, None))
        self._shard_layouts = (
            jax.device_put(pv.astype(np.int32), sh2),
            jax.device_put(pid.astype(np.int32), sh3),
            jax.device_put(ts.astype(np.int32), sh2),
            jax.device_put(te.astype(np.int32), sh2))

    # -- properties ---------------------------------------------------------

    @property
    def num_nodes(self) -> int:
        return self._num_nodes

    @property
    def num_shards(self) -> int:
        return self.mesh.shape[self.axis]

    # -- message passing ----------------------------------------------------

    def _shard_map(self, fn, *args, out_spec=P()):
        ax = self.axis
        return shard_map(
            fn, mesh=self.mesh,
            in_specs=(P(ax, None, None), P(ax, None)) + tuple(
                P() for _ in args),
            out_specs=out_spec,
            check_vma=False,
        )(self.edges, self.mask, *args)

    def send_u_recv(self, feature, reduce_op: str = "sum"):
        """Edge-sharded SpMM: local masked partial aggregation + ``psum``
        (sum/mean) or ``pmax``/``pmin`` (max/min) over the mesh axis
        (reference allreduce at ``pgl/graph.py:1528``; op matrix at
        ``pgl/graph.py:860-887``)."""
        if reduce_op not in ("sum", "mean", "max", "min"):
            raise ValueError(reduce_op)
        N, ax = self._num_nodes, self.axis

        if reduce_op in ("max", "min"):
            seg_fn = (jax.ops.segment_max if reduce_op == "max"
                      else jax.ops.segment_min)
            comb = jax.lax.pmax if reduce_op == "max" else jax.lax.pmin
            fill = -jnp.inf if reduce_op == "max" else jnp.inf

            def local(edges, mask, feat):
                e, m = edges[0], mask[0]
                mb = (m > 0).reshape((-1,) + (1,) * (feat.ndim - 1))
                msg = jnp.where(mb, jnp.take(feat, e[:, 0], axis=0), fill)
                partial = seg_fn(msg, e[:, 1], num_segments=N)
                partial = comb(partial, ax)
                # empty-dst contract: no message -> zeros (pgl/graph.py:806)
                return jnp.where(jnp.isfinite(partial), partial, 0.0)

            return self._shard_map(local, feature)

        from ..ops.dispatch import use_pallas_spmm
        use_pallas = (self._shard_layouts is not None
                      and use_pallas_spmm(feature,
                                          int(self.edges.shape[1])))
        if use_pallas:
            out = self._pallas_send_u_recv(feature)
        else:
            def local(edges, mask, feat):
                e = edges[0]      # [E_pad, 2] (leading shard dim is 1)
                m = mask[0]       # [E_pad]
                msg = jnp.take(feat, e[:, 0], axis=0) * m[:, None]
                partial = jax.ops.segment_sum(msg, e[:, 1], num_segments=N)
                return jax.lax.psum(partial, ax)

            out = self._shard_map(local, feature)
        if reduce_op == "mean":
            deg = self.indegree().astype(out.dtype)
            out = out / jnp.maximum(deg, 1.0)[:, None]
        return out

    def _pallas_send_u_recv(self, feature):
        """Local Pallas SpMM per shard (dst-sorted within shard) + psum —
        the partial sums ride the one-hot-MXU kernel instead of XLA's
        scatter, and the psum still rides ICI."""
        from ..ops.pallas.segment_kernels import _blocked_spmm
        N, ax = self._num_nodes, self.axis
        pv, pid, ts, te = self._shard_layouts
        d = feature.shape[1]
        pad = (-d) % 128

        def local(pv, pid, ts, te, feat):
            x = feat
            if pad:
                x = jnp.concatenate(
                    [x, jnp.zeros((x.shape[0], pad), x.dtype)], axis=1)
            partial = _blocked_spmm(x, pv[0], pid[0], ts[0], te[0], N,
                                    256, 1024, False)
            if pad:
                partial = partial[:, :d]
            return jax.lax.psum(partial, ax)

        return shard_map(
            local, mesh=self.mesh,
            in_specs=(P(ax, None), P(ax, None, None), P(ax, None),
                      P(ax, None), P()),
            out_specs=P(), check_vma=False,
        )(pv, pid, ts, te, feature)

    send_recv = send_u_recv

    def send_ue_recv(self, feature, edge_feat, message_op: str = "mul",
                     reduce_op: str = "sum"):
        """Edge-weighted sharded SpMM; ``edge_feat`` is ``[S, E_pad, ...]``
        (sharded, from :meth:`shard_edge_values`). Full reference op matrix
        (``pgl/graph.py:889-937``): message add/sub/mul/div × reduce
        sum/mean/max/min. sum/mean combine partials with ``psum``; max/min
        with ``pmax``/``pmin``; mean divides by the psum'd edge count."""
        if message_op not in ("add", "sub", "mul", "div"):
            raise ValueError(message_op)
        if reduce_op not in ("sum", "mean", "max", "min"):
            raise ValueError(reduce_op)
        N, ax = self._num_nodes, self.axis

        def local(edges, mask, feat, ef):
            e, m = edges[0], mask[0]
            msg = jnp.take(feat, e[:, 0], axis=0)
            w = ef[0]
            if w.ndim < msg.ndim:
                w = w.reshape(w.shape + (1,) * (msg.ndim - w.ndim))
            msg = {"add": msg + w, "sub": msg - w,
                   "mul": msg * w, "div": msg / w}[message_op]
            mb = (m > 0).reshape((-1,) + (1,) * (msg.ndim - 1))
            if reduce_op in ("sum", "mean"):
                # where (not multiply) masking: div pads produce inf/nan
                partial = jax.ops.segment_sum(
                    jnp.where(mb, msg, 0.0), e[:, 1], num_segments=N)
                out = jax.lax.psum(partial, ax)
                if reduce_op == "mean":
                    deg = jax.lax.psum(
                        jax.ops.segment_sum(m, e[:, 1], num_segments=N), ax)
                    out = out / jnp.maximum(deg, 1.0).reshape(
                        (-1,) + (1,) * (out.ndim - 1))
                return out
            seg_fn = (jax.ops.segment_max if reduce_op == "max"
                      else jax.ops.segment_min)
            comb = jax.lax.pmax if reduce_op == "max" else jax.lax.pmin
            fill = -jnp.inf if reduce_op == "max" else jnp.inf
            partial = seg_fn(jnp.where(mb, msg, fill), e[:, 1],
                             num_segments=N)
            partial = comb(partial, ax)
            return jnp.where(jnp.isfinite(partial), partial, 0.0)

        ef_spec = P(self.axis, None) if edge_feat.ndim == 2 \
            else P(self.axis, None, None)
        return shard_map(
            local, mesh=self.mesh,
            in_specs=(P(ax, None, None), P(ax, None), P(), ef_spec),
            out_specs=P(), check_vma=False,
        )(self.edges, self.mask, feature, edge_feat)

    def send_uv(self, src_feat, dst_feat, message_op: str = "add"):
        """Sharded SDDMM: per-edge outputs stay sharded ``[S, E_pad, ...]``."""
        ax = self.axis

        def local(edges, mask, sf, df):
            e, m = edges[0], mask[0]
            a = jnp.take(sf, e[:, 0], axis=0)
            b = jnp.take(df, e[:, 1], axis=0)
            out = {"add": a + b, "sub": a - b, "mul": a * b,
                   "div": a / b}[message_op]
            out = out * m.reshape((-1,) + (1,) * (out.ndim - 1))
            return out[None]

        out_spec = P(ax, None) if src_feat.ndim == 1 else P(ax, None, None)
        return shard_map(
            local, mesh=self.mesh,
            in_specs=(P(ax, None, None), P(ax, None), P(), P()),
            out_specs=out_spec, check_vma=False,
        )(self.edges, self.mask, src_feat, dst_feat)

    def edge_softmax(self, logits):
        """Distributed softmax over incoming edges: per-shard (max, sum)
        exchange then local normalize — the blockwise-softmax trick noted in
        SURVEY.md §5 for edges spanning partitions. ``logits`` is sharded
        ``[S, E_pad]`` (or ``[S, E_pad, H]``)."""
        N, ax = self._num_nodes, self.axis

        def local(edges, mask, lg):
            e, m = edges[0], mask[0]
            x = lg[0]
            mb = (m > 0)
            mexp = mb.reshape((-1,) + (1,) * (x.ndim - 1))
            neg = jnp.full_like(x, -jnp.inf)
            x_masked = jnp.where(mexp, x, neg)
            local_max = jax.ops.segment_max(x_masked, e[:, 1],
                                            num_segments=N)
            gmax = jax.lax.pmax(local_max, ax)
            gmax = jnp.where(jnp.isfinite(gmax), gmax, 0.0)
            ex = jnp.exp(x - jnp.take(gmax, e[:, 1], axis=0))
            ex = jnp.where(mexp, ex, 0.0)
            denom = jax.ops.segment_sum(ex, e[:, 1], num_segments=N)
            denom = jax.lax.psum(denom, ax)
            denom = jnp.maximum(denom, jnp.finfo(x.dtype).tiny)
            return (ex / jnp.take(denom, e[:, 1], axis=0))[None]

        spec = P(ax, None) if logits.ndim == 2 else P(ax, None, None)
        return shard_map(
            local, mesh=self.mesh,
            in_specs=(P(ax, None, None), P(ax, None), spec),
            out_specs=spec, check_vma=False,
        )(self.edges, self.mask, logits)

    def indegree(self):
        N, ax = self._num_nodes, self.axis

        def local(edges, mask):
            e, m = edges[0], mask[0]
            partial = jax.ops.segment_sum(m, e[:, 1], num_segments=N)
            return jax.lax.psum(partial, ax)

        return self._shard_map(local).astype(jnp.int32)

    def outdegree(self):
        N, ax = self._num_nodes, self.axis

        def local(edges, mask):
            e, m = edges[0], mask[0]
            partial = jax.ops.segment_sum(m, e[:, 0], num_segments=N)
            return jax.lax.psum(partial, ax)

        return self._shard_map(local).astype(jnp.int32)

    def shard_edge_values(self, values: np.ndarray):
        """Host helper: permute per-edge values (original order) into the
        sharded ``[S, E_pad, ...]`` layout."""
        if self.perm_scope != "global":
            raise ValueError(
                "this graph was built from per-host edge shards, so no "
                "global edge order exists; pass per-shard edge values via "
                "multihost.shard_edge_values_from_host_shards instead")
        values = np.asarray(values)
        perm = np.asarray(self.perm)
        out = values[perm.reshape(-1)].reshape(perm.shape + values.shape[1:])
        spec = P(self.axis, None) if values.ndim == 1 \
            else P(self.axis, None, None)
        return jax.device_put(out, NamedSharding(self.mesh, spec))

    # -- pytree -------------------------------------------------------------

    def tree_flatten(self):
        return ((self.edges, self.mask, self.perm, self.node_feat,
                 self.edge_feat, self._shard_layouts),
                (self._num_nodes, self.mesh, self.axis, self.perm_scope))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        (obj.edges, obj.mask, obj.perm, obj.node_feat,
         obj.edge_feat, obj._shard_layouts) = children
        obj._num_nodes, obj.mesh, obj.axis, obj.perm_scope = aux
        return obj

    def __repr__(self):
        return (f"ShardedGraph(num_nodes={self._num_nodes}, "
                f"shards={self.num_shards}x{self.edges.shape[1]} edges, "
                f"axis={self.axis!r})")
