"""GraphSAGE layered neighbor sampling.

Host path: :func:`graphsage_sample` — behavior parity with the reference
(``pgl/sampling/sage.py:59-127``: layered reverse sampling with global
node/eid dedup, ignore-edge filter, reindex, returns a list of
``(subgraph, sample_index, node_index)``), but vectorized over numpy + the
C++ sampler instead of per-edge Python loops.

Device path: :class:`NeighborSampler` — the TPU-native analog of the
reference's GPU sampler (``pgl/sampling/sage.py:130-155``). TPUs need static
shapes, so it produces *padded* ``[B, k]`` neighbor blocks with masks
(sampling with replacement), fully jittable with ``jax.random``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..graph import Graph
from ..native import graph_kernel as native
from .custom import subgraph

__all__ = ["graphsage_sample", "NeighborSampler",
           "HeteroNeighborSampler", "sample_neighbors_padded",
           "make_padded_batch_fn", "pack_padded_batch",
           "unpack_padded_batch"]


def _ordered_union(base: np.ndarray, new: np.ndarray):
    """Append unseen values of ``new`` (first-occurrence order) to ``base``.
    Returns (union, fresh)."""
    if new.size == 0:
        return base, new
    mask = ~np.isin(new, base)
    fresh = new[mask]
    if fresh.size:
        _, first = np.unique(fresh, return_index=True)
        fresh = fresh[np.sort(first)]
    return np.concatenate([base, fresh]), fresh


def graphsage_sample(graph, nodes, samples: Sequence[int],
                     ignore_edges=(), seed: int = 0):
    """Layered reverse neighbor sampling.

    Args:
      graph: numpy-mode Graph.
      nodes: seed node ids.
      samples: neighbors per layer, e.g. ``[25, 10]``.
      ignore_edges: iterable of (src, dst) pairs to skip (e.g. the linkage
        being predicted).

    Returns a list of ``num_layers`` tuples ``(subgraph, sample_index,
    node_index)`` where ``sample_index[i]`` is the parent-graph id of
    subgraph node ``i`` and ``node_index`` are the reindexed seed ids.
    Layer ``i``'s subgraph contains edges from sampling steps ``i..L-1``
    (reference accumulation order).
    """
    if graph.is_tensor:
        raise ValueError("You must call Graph.numpy() first.")
    seeds = np.asarray(nodes, dtype=np.int64)
    num_layers = len(samples)
    index = graph.adj_dst_index
    indptr = np.asarray(index.indptr)
    sorted_v = np.asarray(index.sorted_v)
    sorted_eid = np.asarray(index.sorted_eid)

    ignore = None
    if len(ignore_edges):
        # exact key: s * num_nodes + d (Python ints don't overflow) — a
        # fixed multiplier would collide once ids exceed it
        base = int(graph.num_nodes)
        ig = np.asarray(list(ignore_edges), dtype=np.int64)
        ignore = set(int(s) * base + int(d) for s, d in ig)

    all_nodes = seeds.copy()
    all_eids = np.zeros((0,), dtype=np.int64)
    all_edges = np.zeros((0, 2), dtype=np.int64)
    start_nodes = seeds
    snapshots = []  # (eids, edges) after each processed layer

    for layer_idx in reversed(range(num_layers)):
        if start_nodes.size:
            out_indptr, out_v, out_eid = native.sample_subset_with_eid(
                indptr, sorted_v, sorted_eid, start_nodes,
                samples[layer_idx], seed=seed + layer_idx)
            counts = np.diff(out_indptr)
            dst = np.repeat(start_nodes, counts)
            src = out_v
            eids = out_eid
            if ignore is not None and src.size:
                keep = np.fromiter(
                    ((int(s) * base + int(d)) not in ignore
                     for s, d in zip(src, dst)), dtype=bool, count=len(src))
                src, dst, eids = src[keep], dst[keep], eids[keep]
            # dedupe eids against everything collected so far
            if eids.size:
                mask = ~np.isin(eids, all_eids)
                fresh_e = eids[mask]
                if fresh_e.size:
                    _, first = np.unique(fresh_e, return_index=True)
                    order = np.sort(first)
                    all_eids = np.concatenate([all_eids, fresh_e[order]])
                    all_edges = np.concatenate(
                        [all_edges,
                         np.stack([src[mask][order], dst[mask][order]],
                                  axis=1)])
            all_nodes, fresh_nodes = _ordered_union(all_nodes, src)
            start_nodes = fresh_nodes
        snapshots.append((all_eids.copy(), all_edges.copy()))

    snapshots = snapshots[::-1]  # snapshots[i] for output layer i
    sample_index = all_nodes
    node_index = native.map_nodes(all_nodes, seeds)

    # every layer's edge list is a prefix of the full accumulated set
    # (all_eids/all_edges only ever append), so reindex and feature-slice
    # ONCE and hand each layer its prefix — the per-layer subgraph()
    # calls redid the map_nodes pass and the [num_sampled, D] feature
    # gathers num_layers times
    from ..graph import Graph
    full_eids, full_edges = snapshots[0]
    if full_edges.size:
        sub_edges_full = native.map_nodes(
            all_nodes, full_edges.reshape(-1)).reshape(-1, 2)
    else:
        sub_edges_full = np.zeros((0, 2), dtype=np.int64)
    node_feat = {k: np.asarray(v)[all_nodes]
                 for k, v in graph.node_feat.items()}
    graph_list = []
    for i in range(num_layers):
        eids_i, _ = snapshots[i]
        k = len(eids_i)
        edge_feat = {key: np.asarray(v)[eids_i]
                     for key, v in graph.edge_feat.items()}
        sg = Graph(sub_edges_full[:k], num_nodes=len(all_nodes),
                   node_feat=node_feat, edge_feat=edge_feat)
        graph_list.append((sg, sample_index, node_index))
    return graph_list


def sample_neighbors_padded(indptr, sorted_v, nodes, k: int, key):
    """Jittable uniform neighbor sampling (with replacement) from a
    device-resident CSC: returns ``(neighbors [B, k], mask [B, k])``.
    Zero-degree nodes get mask 0."""
    import jax
    import jax.numpy as jnp

    starts = jnp.take(indptr, nodes)
    degs = jnp.take(indptr, nodes + 1) - starts
    u = jax.random.uniform(key, (nodes.shape[0], k))
    offs = jnp.floor(u * jnp.maximum(degs, 1)[:, None]).astype(starts.dtype)
    idx = starts[:, None] + offs
    neigh = jnp.take(sorted_v, idx)
    mask = (degs > 0)[:, None] & jnp.ones((1, k), bool)
    return neigh, mask


class NeighborSampler:
    """Device-side layered sampler producing padded neighbor blocks.

    For each layer size ``k`` it emits ``(frontier, neighbors [B, k],
    mask [B, k])`` where the next frontier is the flattened neighbor block —
    the fixed-shape analog of the reference's ``reindex_graph`` pipeline,
    consumable by bipartite-style layers without dynamic compaction.
    """

    def __init__(self, graph, samples: Sequence[int]):
        import jax.numpy as jnp
        if graph.num_edges >= 2 ** 31:
            raise ValueError(
                f"NeighborSampler stores indptr as int32; {graph.num_edges}"
                " edges would wrap — shard the graph first")
        idx = graph.adj_dst_index
        self.indptr = jnp.asarray(np.asarray(idx.indptr), dtype=jnp.int32)
        self.sorted_v = jnp.asarray(np.asarray(idx.sorted_v),
                                    dtype=jnp.int32)
        self.samples = list(samples)

    def sample(self, nodes, key):
        import jax
        layers = []
        frontier = nodes
        for k in self.samples:
            key, sub = jax.random.split(key)
            neigh, mask = sample_neighbors_padded(
                self.indptr, self.sorted_v, frontier, k, sub)
            layers.append((frontier, neigh, mask))
            frontier = neigh.reshape(-1)
        return layers[::-1], frontier


class HeteroNeighborSampler:
    """Per-edge-type padded device sampler over a HeterGraph (analog of the
    reference's ``HeteroNeighborSampler``, ``pgl/sampling/sage.py:158``):
    each layer samples ``k`` neighbors for every requested edge type,
    returning fixed-shape blocks per etype."""

    def __init__(self, hetergraph, samples: Sequence[int],
                 etypes: Optional[Sequence[str]] = None):
        import jax.numpy as jnp
        self.etypes = list(etypes or hetergraph.edge_types)
        self.samples = list(samples)
        self._csc = {}
        for etype in self.etypes:
            if hetergraph[etype].num_edges >= 2 ** 31:
                raise ValueError(
                    f"HeteroNeighborSampler stores indptr as int32; "
                    f"{etype} has {hetergraph[etype].num_edges} edges — "
                    "shard the graph first")
            idx = hetergraph[etype].adj_dst_index
            self._csc[etype] = (
                jnp.asarray(np.asarray(idx.indptr), dtype=jnp.int32),
                jnp.asarray(np.asarray(idx.sorted_v), dtype=jnp.int32))

    def sample(self, nodes, key):
        import jax
        layers = []
        frontier = nodes
        for k in self.samples:
            per_etype = {}
            nexts = [frontier]
            for etype in self.etypes:
                key, sub = jax.random.split(key)
                indptr, sorted_v = self._csc[etype]
                neigh, mask = sample_neighbors_padded(
                    indptr, sorted_v, frontier, k, sub)
                per_etype[etype] = (neigh, mask)
                nexts.append(neigh.reshape(-1))
            layers.append((frontier, per_etype))
            import jax.numpy as jnp
            frontier = jnp.concatenate(nexts)
        return layers[::-1], frontier


def make_padded_batch_fn(graph, samples, n_bucket: int, e_bucket: int,
                         pack: bool = False):
    """Dataloader ``collate_fn`` for host-sampled minibatch training:
    GraphSAGE-sample the batch's (node, label) items, then pack the
    subgraph into FIXED-size padded-CSC arrays so the device step
    compiles once per bucket (the XLA static-shape analog of the
    reference pipeline at
    ``examples/graphsage/cpu_sample_version/train.py`` — there the
    ragged subgraph recompiles nothing because Paddle is eager).

    Row ``n_bucket - 1`` is RESERVED as the pad sentinel: the
    ``e_bucket - ne`` pad edges aggregate into it and ``smask`` zeroes
    it, so batches must satisfy ``ns < n_bucket`` (a real node in the
    sentinel row would receive the pad edges' self-aggregation).

    Returns ``(edges, deg, su, sv, se, indptr, sidx, smask, y, mask)``;
    rebuild the device graph with
    ``Graph(edges, num_nodes=n_bucket,
    adj_dst_index=EdgeIndex(deg, su, sv, se, indptr))`` and gather
    features by ``sidx`` (masked by ``smask``).
    """
    def batch_fn(items):
        nodes = np.asarray([n for n, _ in items])
        labels = np.asarray([lb for _, lb in items])
        sub, sample_index, node_index = graphsage_sample(
            graph, nodes, samples)[0]
        ns, ne = sub.num_nodes, sub.num_edges
        if ns >= n_bucket or ne > e_bucket:
            raise RuntimeError(
                f"bucket too small: {ns}/{n_bucket} nodes (last row is "
                f"the pad sentinel: need ns < n_bucket), "
                f"{ne}/{e_bucket} edges")
        idx = sub.adj_dst_index                  # host C++ CSC build
        su = np.full(e_bucket, n_bucket - 1, np.int32)
        su[:ne] = np.asarray(idx.sorted_u)       # stays sorted (pad=max)
        sv = np.full(e_bucket, n_bucket - 1, np.int32)
        sv[:ne] = np.asarray(idx.sorted_v)
        se = np.arange(e_bucket, dtype=np.int32)
        deg = np.zeros(n_bucket, np.int32)
        deg[:ns] = np.asarray(idx.degree)
        deg[n_bucket - 1] += e_bucket - ne       # pads -> sentinel row
        indptr = np.full(n_bucket + 1, ne, np.int64)
        indptr[:ns + 1] = np.asarray(idx.indptr)
        indptr[n_bucket] = e_bucket
        sidx = np.zeros(n_bucket, np.int32)
        sidx[:ns] = sample_index
        smask = np.zeros((n_bucket, 1), np.float32)
        smask[:ns] = 1.0
        y = np.zeros(n_bucket, np.int32)
        mask = np.zeros(n_bucket, np.float32)
        y[node_index] = labels
        mask[node_index] = 1.0
        edges = np.stack([sv, su], axis=1)
        return edges, deg, su, sv, se, indptr, sidx, smask, y, mask

    def batch_fn_packed(items):
        edges, deg, su, sv, se, indptr, sidx, smask, y, mask = \
            batch_fn(items)
        ns = int(smask.sum())
        return pack_padded_batch(ns, su, sv, deg, indptr, sidx, y, mask)

    return batch_fn_packed if pack else batch_fn


def pack_padded_batch(ns, su, sv, deg, indptr, sidx, y, mask):
    """Pack one padded batch into a SINGLE int32 buffer — one host→device
    transfer per batch instead of ~10 (each transfer is a round trip on
    remote/tunneled devices; measured ~20 ms/batch of pure transfer
    latency at 10 arrays). Derivable arrays (``se`` iota, ``edges``
    stack, ``smask`` from ``ns``) are rebuilt in-jit by
    :func:`unpack_padded_batch`."""
    return np.concatenate([
        np.asarray([ns], np.int32),
        su.astype(np.int32), sv.astype(np.int32),
        deg.astype(np.int32), indptr.astype(np.int32),
        sidx.astype(np.int32), y.astype(np.int32),
        mask.astype(np.int32)])


def unpack_padded_batch(buf, n_bucket: int, e_bucket: int):
    """In-jit inverse of :func:`pack_padded_batch` (static slices only).
    Returns the same tuple as the unpacked ``batch_fn``."""
    import jax.numpy as jnp
    n, e = n_bucket, e_bucket
    o = 1
    ns = buf[0]
    su = buf[o:o + e]; o += e
    sv = buf[o:o + e]; o += e
    deg = buf[o:o + n]; o += n
    indptr = buf[o:o + n + 1].astype(jnp.int64); o += n + 1
    sidx = buf[o:o + n]; o += n
    y = buf[o:o + n]; o += n
    mask = buf[o:o + n].astype(jnp.float32)
    se = jnp.arange(e, dtype=jnp.int32)
    edges = jnp.stack([sv, su], axis=1)
    smask = (jnp.arange(n) < ns)[:, None].astype(jnp.float32)
    return edges, deg, su, sv, se, indptr, sidx, smask, y, mask
