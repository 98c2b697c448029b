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

__all__ = ["initialize", "edge_mesh", "sharded_graph_from_host_shards"]


def initialize(**kwargs):
    """``jax.distributed.initialize`` guarded for single-host runs."""
    try:
        if jax.process_count() > 1 or kwargs:
            return
    except RuntimeError:
        pass
    try:
        jax.distributed.initialize(**kwargs)
    except Exception:
        # single-host / already initialized
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
    e_pad_local = 1
    for sid in local_ids:
        e = np.asarray(load_shard(sid))
        e = e[np.argsort(e[:, 1], kind="stable")]
        local_shards[sid] = e
        e_pad_local = max(e_pad_local, len(e))
    e_pad = int(np.asarray(jax.experimental.multihost_utils
                           .process_allgather(
                               jnp.asarray([e_pad_local]))).max()) \
        if jax.process_count() > 1 else e_pad_local
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
    perm = jax.device_put(np.zeros((n_shards, e_pad), np.int32),
                          mask_sharding)
    rep = NamedSharding(mesh, P())
    feats = {k: jax.device_put(np.asarray(v), rep)
             for k, v in (node_feat or {}).items()}
    return ShardedGraph(edges, mask, perm, num_nodes, mesh, axis,
                        node_feat=feats)
