"""CSR/CSC edge index — the sorted-adjacency container behind every Graph.

Capability parity with the reference ``pgl/utils/edge_index.py`` (fields
``degree, sorted_u, sorted_v, sorted_eid, indptr``; numpy build via the Cython
``graph_kernel.build_index`` at ``pgl/utils/edge_index.py:56-57``, tensor build
via argsort at ``:43-54``; neighbor views ``view_v/view_eid`` at ``:103,116``).

TPU-first differences:
  * ids are int32 on device (TPUs have no native int64 ALU path; the host
    accepts int64 and reindexes — see SURVEY.md §7 "int64 ids on TPU").
  * ``segment_ids`` (= u repeated by degree) is precomputed at build time so
    every ``recv`` is a *sorted* segment reduce with zero per-call sorting.
  * the device form is an immutable pytree; conversion is ``device_put``, not
    in-place mutation.

The O(E) counting-sort build is provided by the C++ host kernel
(``pgl_tpu.native``) when compiled, with a pure-numpy fallback.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..native import graph_kernel as _native

__all__ = ["EdgeIndex"]

_ID_DTYPE = np.int32


@jax.tree_util.register_pytree_node_class
class EdgeIndex:
    """Sorted adjacency: for each node ``u`` its neighbors ``v`` are contiguous.

    Attributes (numpy or jax arrays depending on mode):
      degree:      [N]   neighbor count per u
      sorted_u:    [E]   edge source (sorted ascending)
      sorted_v:    [E]   edge destination, grouped by u
      sorted_eid:  [E]   original edge id of each sorted position
      indptr:      [N+1] CSR row pointer
      segment_ids: [E]   == sorted_u (alias kept for clarity at reduce sites)
    """

    def __init__(self, degree, sorted_u, sorted_v, sorted_eid, indptr):
        self.degree = degree
        self.sorted_u = sorted_u
        self.sorted_v = sorted_v
        self.sorted_eid = sorted_eid
        self.indptr = indptr

    # -- construction -------------------------------------------------------

    @classmethod
    def from_edges(cls, u, v, num_nodes: int) -> "EdgeIndex":
        """Build on host with the O(E) native counting sort (numpy fallback)."""
        u = np.asarray(u)
        v = np.asarray(v)
        # validate BEFORE the native kernel: its counting sort writes
        # degree[u[e]] with no bounds check, so an out-of-range id would
        # corrupt heap memory instead of raising (the numpy path errors).
        # Only u indexes the degree buffer — v is payload and may live in
        # a different node space (BiGraph src/dst sides).
        if u.size:
            lo, hi = int(u.min()), int(u.max())
            if lo < 0 or hi >= num_nodes:
                raise ValueError(
                    f"edge source ids in [{lo}, {hi}] out of range for "
                    f"num_nodes={num_nodes}")
        if u.shape[0] >= 2 ** 31 or num_nodes >= 2 ** 31:
            raise ValueError(
                f"int32 id layout: {u.shape[0]} edges / {num_nodes} nodes "
                "would wrap — shard the graph first")
        if _native.available():
            degree, sorted_v, sorted_eid, indptr = _native.build_index(
                u.astype(np.int64), v.astype(np.int64), num_nodes)
            degree = degree.astype(_ID_DTYPE)
            sorted_v = sorted_v.astype(_ID_DTYPE)
            sorted_eid = sorted_eid.astype(_ID_DTYPE)
            indptr = indptr.astype(np.int64)
        else:
            u32 = u.astype(np.int64)
            degree = np.bincount(u32, minlength=num_nodes).astype(_ID_DTYPE)
            indptr = np.zeros(num_nodes + 1, dtype=np.int64)
            np.cumsum(degree, out=indptr[1:])
            order = np.argsort(u32, kind="stable")
            sorted_eid = order.astype(_ID_DTYPE)
            sorted_v = v[order].astype(_ID_DTYPE)
        sorted_u = np.repeat(
            np.arange(num_nodes, dtype=_ID_DTYPE), degree)
        return cls(degree, sorted_u, sorted_v, sorted_eid, indptr)

    @classmethod
    def from_edges_device(cls, u, v, num_nodes: int) -> "EdgeIndex":
        """Jittable device-side build (argsort + segment counts).

        Mirrors the reference tensor path (``pgl/utils/edge_index.py:43-54``)
        but stays fully inside XLA: stable argsort of u, degree via
        segment-sum, indptr via cumsum.
        """
        u = jnp.asarray(u, dtype=jnp.int32)
        v = jnp.asarray(v, dtype=jnp.int32)
        order = jnp.argsort(u, stable=True)
        sorted_u = u[order]
        sorted_v = v[order]
        degree = jax.ops.segment_sum(
            jnp.ones_like(u), u, num_segments=num_nodes)
        indptr = jnp.concatenate(
            [jnp.zeros((1,), dtype=jnp.int32), jnp.cumsum(degree)])
        return cls(degree, sorted_u, sorted_v, order.astype(jnp.int32), indptr)

    # -- host-side views (numpy mode only) ----------------------------------

    def view_v(self, u=None):
        """Ragged neighbor view (list of arrays) — reference ``:103``."""
        indptr = np.asarray(self.indptr)
        sorted_v = np.asarray(self.sorted_v)
        if u is None:
            return [sorted_v[indptr[i]:indptr[i + 1]]
                    for i in range(len(indptr) - 1)]
        u = np.asarray(u).reshape(-1)
        return [sorted_v[indptr[i]:indptr[i + 1]] for i in u]

    def view_eid(self, u=None):
        """Ragged edge-id view — reference ``:116``."""
        indptr = np.asarray(self.indptr)
        sorted_eid = np.asarray(self.sorted_eid)
        if u is None:
            return [sorted_eid[indptr[i]:indptr[i + 1]]
                    for i in range(len(indptr) - 1)]
        u = np.asarray(u).reshape(-1)
        return [sorted_eid[indptr[i]:indptr[i + 1]] for i in u]

    def triples(self) -> Tuple:
        """(sorted_u, sorted_v, sorted_eid) — reference ``:129``."""
        return self.sorted_u, self.sorted_v, self.sorted_eid

    @property
    def segment_ids(self):
        return self.sorted_u

    @property
    def is_tensor(self) -> bool:
        return isinstance(self.sorted_v, jax.Array)

    # -- conversion ---------------------------------------------------------

    def tensor(self, sharding=None) -> "EdgeIndex":
        """Immutable device copy (int32 ids)."""
        if self.is_tensor:
            return self
        put = (lambda x: jax.device_put(x, sharding)) if sharding else jnp.asarray
        return EdgeIndex(
            put(np.asarray(self.degree, dtype=_ID_DTYPE)),
            put(np.asarray(self.sorted_u, dtype=_ID_DTYPE)),
            put(np.asarray(self.sorted_v, dtype=_ID_DTYPE)),
            put(np.asarray(self.sorted_eid, dtype=_ID_DTYPE)),
            put(np.asarray(self.indptr, dtype=_ID_DTYPE)),
        )

    def numpy(self) -> "EdgeIndex":
        if not self.is_tensor:
            return self
        return EdgeIndex(*(np.asarray(x) for x in (
            self.degree, self.sorted_u, self.sorted_v, self.sorted_eid,
            self.indptr)))

    # -- persistence (reference ``:73-95,208-219``) --------------------------

    def dump(self, path):
        import os
        os.makedirs(path, exist_ok=True)
        idx = self.numpy()
        np.save(os.path.join(path, "degree.npy"), np.asarray(idx.degree))
        np.save(os.path.join(path, "sorted_u.npy"), np.asarray(idx.sorted_u))
        np.save(os.path.join(path, "sorted_v.npy"), np.asarray(idx.sorted_v))
        np.save(os.path.join(path, "sorted_eid.npy"), np.asarray(idx.sorted_eid))
        np.save(os.path.join(path, "indptr.npy"), np.asarray(idx.indptr))

    @classmethod
    def load(cls, path, mmap_mode: Optional[str] = "r") -> "EdgeIndex":
        import os
        load = lambda n: np.load(os.path.join(path, n), mmap_mode=mmap_mode)
        return cls(load("degree.npy"), load("sorted_u.npy"),
                   load("sorted_v.npy"), load("sorted_eid.npy"),
                   load("indptr.npy"))

    # -- pytree protocol ----------------------------------------------------

    def tree_flatten(self):
        return ((self.degree, self.sorted_u, self.sorted_v, self.sorted_eid,
                 self.indptr), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __repr__(self):
        mode = "tensor" if self.is_tensor else "numpy"
        return (f"EdgeIndex(num_nodes={len(self.degree)}, "
                f"num_edges={len(self.sorted_v)}, mode={mode})")
