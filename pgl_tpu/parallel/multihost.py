"""Multi-host helpers: bootstrap + host-sharded graph loading.

Replaces the reference's MPI bootstrap (``pgl/distributed/launch.py:28-57``)
with ``jax.distributed`` (native on TPU pods), and gives ShardedGraph a
multi-host construction path where **each host touches only its own edge
shard** — the loading pattern for graphs that exceed one host's RAM
(PGLBox-scale ingestion).

Typical use on an N-host slice (same program on every host):

    initialize()                       # no-op on single host
    mesh = edge_mesh()                 # 1-D mesh over all global devices
    sg = sharded_graph_from_host_shards(
        lambda shard_id: np.load(f"edges_{shard_id}.npy"),
        num_nodes=N, mesh=mesh, node_feat={"h": my_host_feats})
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .dist_graph import ShardedGraph

__all__ = ["initialize", "edge_mesh", "sharded_graph_from_host_shards",
           "shard_edge_values_from_host_shards"]


def initialize(**kwargs):
    """``jax.distributed.initialize`` guarded for single-host runs.

    With explicit kwargs (coordinator_address, num_processes, process_id, …)
    this *must* bootstrap the cluster, so failures propagate. Without
    kwargs it is best-effort auto-detection: on a single host (or when the
    runtime is already initialized) it is a silent no-op.
    """
    state = getattr(jax.distributed, "global_state", None)
    if state is not None and getattr(state, "client", None) is not None:
        return  # already initialized
    if kwargs:
        jax.distributed.initialize(**kwargs)
        return
    try:
        jax.distributed.initialize()
    except Exception:
        # single-host / no cluster env to auto-detect
        pass


def edge_mesh(axis: str = "edge") -> Mesh:
    """1-D mesh over every global device (ICI within a slice, DCN across)."""
    return Mesh(np.array(jax.devices()), (axis,))


def sharded_graph_from_host_shards(
        load_shard: Callable[[int], np.ndarray], num_nodes: int, mesh: Mesh,
        axis: str = "edge", node_feat: Optional[Dict] = None,
        strategy: str = "dst_range") -> ShardedGraph:
    """Build a ShardedGraph where each host loads only its devices' shards.

    ``load_shard(shard_id)`` returns that shard's ``[E_s, 2]`` global-id
    edge array (shard ids follow mesh device order). Edges are dst-sorted
    per shard and padded to a globally agreed length
    (``jax.process_allgather`` would negotiate it; here the caller's shards
    must already be balanced to within the padding the strategy produces —
    ``graph_sharding`` tooling in ``partition`` prepares such shards).

    Node features are host-replicated (each host passes the full array or a
    ``SharedEmbedding``-backed view).
    """
    devices = list(mesh.devices.flat)
    n_shards = len(devices)
    local_ids = [i for i, d in enumerate(devices)
                 if d.process_index == jax.process_index()]
    # load + locally sort/pad this host's shards
    local_shards = {}
    local_perms = {}
    e_pad_local = 1
    for sid in local_ids:
        e = np.asarray(load_shard(sid))
        order = np.argsort(e[:, 1], kind="stable")
        local_shards[sid] = e[order]
        local_perms[sid] = order
        e_pad_local = max(e_pad_local, len(e))
    if jax.process_count() > 1:
        # explicit import: `jax.experimental.multihost_utils` attribute
        # access raises under jax's lazy-deprecation getattr
        from jax.experimental import multihost_utils
        e_pad = int(np.asarray(multihost_utils.process_allgather(
            jnp.asarray([e_pad_local]))).max())
    else:
        e_pad = e_pad_local
    e_pad = (e_pad + 127) // 128 * 128

    def make_local(sid):
        e = local_shards[sid]
        stacked = np.zeros((1, e_pad, 2), np.int32)
        mask = np.zeros((1, e_pad), np.float32)
        stacked[0, :len(e)] = e
        mask[0, :len(e)] = 1.0
        return stacked, mask

    edge_sharding = NamedSharding(mesh, P(axis, None, None))
    mask_sharding = NamedSharding(mesh, P(axis, None))
    stacked_parts = []
    mask_parts = []
    for sid in local_ids:
        st, mk = make_local(sid)
        stacked_parts.append(st)
        mask_parts.append(mk)
    edges = jax.make_array_from_single_device_arrays(
        (n_shards, e_pad, 2), edge_sharding,
        [jax.device_put(st, devices[sid])
         for sid, st in zip(local_ids, stacked_parts)])
    mask = jax.make_array_from_single_device_arrays(
        (n_shards, e_pad), mask_sharding,
        [jax.device_put(mk, devices[sid])
         for sid, mk in zip(local_ids, mask_parts)])
    # perm records each shard's pre-sort (shard-local) edge order so
    # per-shard edge values can be resharded later; there is no global
    # edge order across hosts, hence perm_scope="local".
    perm_parts = []
    for sid in local_ids:
        p = np.zeros((1, e_pad), np.int32)
        p[0, :len(local_perms[sid])] = local_perms[sid]
        perm_parts.append(p)
    perm = jax.make_array_from_single_device_arrays(
        (n_shards, e_pad), mask_sharding,
        [jax.device_put(p, devices[sid])
         for sid, p in zip(local_ids, perm_parts)])
    rep = NamedSharding(mesh, P())
    feats = {k: jax.device_put(np.asarray(v), rep)
             for k, v in (node_feat or {}).items()}
    return ShardedGraph(edges, mask, perm, num_nodes, mesh, axis,
                        node_feat=feats, perm_scope="local")


def shard_edge_values_from_host_shards(
        sg: ShardedGraph, load_values: Callable[[int], np.ndarray]):
    """Reshard per-edge values for a multi-host-constructed ShardedGraph.

    ``load_values(shard_id)`` returns that shard's per-edge values in the
    same order ``load_shard(shard_id)`` returned its edges; they are
    permuted into the graph's dst-sorted layout and placed shard-by-shard.
    """
    mesh, axis = sg.mesh, sg.axis
    devices = list(mesh.devices.flat)
    n_shards, e_pad = sg.mask.shape
    local_ids = [i for i, d in enumerate(devices)
                 if d.process_index == jax.process_index()]
    parts, trailing = [], None
    for sid in local_ids:
        v = np.asarray(load_values(sid))
        mask_s = np.asarray(sg.mask.addressable_shards[
            local_ids.index(sid)].data)[0]
        k = int(mask_s.sum())
        perm_s = np.asarray(sg.perm.addressable_shards[
            local_ids.index(sid)].data)[0, :k]
        trailing = v.shape[1:]
        out = np.zeros((1, e_pad) + trailing, v.dtype)
        out[0, :k] = v[perm_s]
        parts.append(out)
    trailing = trailing if trailing is not None else ()
    spec = P(axis, None) if not trailing else P(axis, None, None)
    return jax.make_array_from_single_device_arrays(
        (n_shards, e_pad) + trailing, NamedSharding(mesh, spec),
        [jax.device_put(p, devices[sid])
         for sid, p in zip(local_ids, parts)])
