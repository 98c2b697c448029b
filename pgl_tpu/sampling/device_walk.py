"""Device-side random-walk generation — walks are produced *on the TPU*
inside one jitted program, no host round trips per hop.

The reference generates metapath walks on-GPU inside its graph engine
(``apps/PGLBox/src/graph.py:84-106``: ``GraphGpuWrapper`` walk generation
feeding ``Dataset``); the framework's host path (``sampling/walk.py``,
C++ ``native.random_walk``) pays a host hop per step and caps PGLBox pass
generation. This module is the TPU-native equivalent:

  * adjacency lives in HBM as the Graph's CSR arrays (indptr / sorted_v /
    degree), walks advance with ``lax.scan`` — each hop is two O(B)
    gathers, so a [B, L] walk block is one fused XLA program;
  * heterogeneous metapaths concatenate the per-etype CSRs into one
    offset-addressed table and pick the etype per hop from a static
    schedule (no ``lax.switch`` over differently-shaped tables);
  * node2vec's p/q second-order bias uses device rejection sampling
    (the same scheme as the C++ kernel, ``pgl/graph_kernel.pyx:142-224``)
    with the is-neighbor test done by vectorized binary search over
    neighbor-sorted adjacency;
  * weighted sampling consumes per-neighborhood alias tables built once
    on host (``native.alias_sample_build_table``) — O(1) per draw on
    device;
  * :func:`skipgram_pairs` turns walk blocks into (src, dst, valid)
    skip-gram pairs in-jit, replacing the host C++ pair kernel on this
    path.

Dead ends emit ``-1`` for every later position — the same convention as
the host C++ walkers (``sampling/walk.py``) — so both pair generators
(the host ``skip_gram_gen_pair``, which stops at negatives, and the
in-jit :func:`skipgram_pairs`, which masks them) see identical walks
from either path.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["DeviceWalker", "skipgram_pairs"]


def _to_i32(x):
    return jnp.asarray(np.asarray(x), jnp.int32)


class DeviceWalker:
    """Build once per graph (host), then call the jitted walk methods.

    Args:
      graph: numpy-mode homogeneous Graph, or HeterGraph for metapaths.
      neighbor_sorted: sort each neighborhood by dst id (host, once);
        required for ``node2vec`` (binary-search membership test).
      weighted: name of a scalar edge feature to build alias tables from
        (weighted first-order sampling), or None for uniform.
    """

    def __init__(self, graph, neighbor_sorted: bool = False,
                 weighted: Optional[str] = None):
        self.is_hetero = hasattr(graph, "edge_types") and \
            getattr(graph, "edge_types", None)
        if self.is_hetero:
            if weighted is not None or neighbor_sorted:
                raise ValueError(
                    "weighted / neighbor_sorted walks are not supported "
                    "for HeterGraph metapath walkers (silently ignoring "
                    "them would sample the wrong distribution)")
            self.etypes = list(graph.edge_types)
            self.num_nodes = graph.num_nodes
            ip, sv, off = [], [], [0]
            for et in self.etypes:
                idx = graph[et].adj_src_index  # successors: u -> out-nbrs
                ip.append(np.asarray(idx.indptr, np.int64))
                sv.append(np.asarray(idx.sorted_v, np.int64))
                off.append(off[-1] + len(sv[-1]))
            # one concatenated edge array; per-etype indptr stacked [R, N+1]
            self._indptr = _to_i32(np.stack(
                [p + o for p, o in zip(ip, off[:-1])]))
            self._sorted_v = _to_i32(np.concatenate(sv) if sv else
                                     np.zeros(1))
        else:
            idx = graph.adj_src_index
            self.num_nodes = graph.num_nodes
            indptr = np.asarray(idx.indptr, np.int64)
            sv = np.asarray(idx.sorted_v, np.int64)
            eid = np.asarray(idx.sorted_eid, np.int64)
            if neighbor_sorted and len(sv):
                # sort within each neighborhood (host, once): stable sort
                # of the composite (owner, dst) key. eid is permuted
                # alongside sv so weights keep attaching to the right
                # neighbor slots when alias tables are built below.
                owner = np.repeat(np.arange(len(indptr) - 1, dtype=np.int64),
                                  np.diff(indptr))
                perm = np.argsort(owner * (sv.max() + 2) + sv, kind="stable")
                sv = sv[perm]
                eid = eid[perm]
            self.neighbor_sorted = neighbor_sorted
            self._indptr = _to_i32(indptr)[None]
            self._sorted_v = _to_i32(sv if len(sv) else np.zeros(1))
            if weighted is not None:
                from ..native import graph_kernel as native
                w = np.asarray(graph.edge_feat[weighted],
                               np.float64).reshape(-1)
                # per-neighborhood alias tables in the (possibly re-sorted)
                # slot order of self._sorted_v
                w = w[eid]
                probs = np.zeros(len(sv), np.float32)
                alias = np.zeros(len(sv), np.int32)
                for u in range(len(indptr) - 1):
                    lo, hi = int(indptr[u]), int(indptr[u + 1])
                    if hi > lo:
                        p_, a_ = native.alias_sample_build_table(
                            w[lo:hi] / max(w[lo:hi].sum(), 1e-12))
                        probs[lo:hi] = p_
                        alias[lo:hi] = a_
                self._alias = (jnp.asarray(probs), _to_i32(alias))
            else:
                self._alias = None

    # -- public walks ---------------------------------------------------------
    # The adjacency arrays are passed as ARGUMENTS to module-level jitted
    # functions — never captured via a static self. Capturing would bake
    # the CSR into the traced program as constants, which at 100M+ edges
    # overflows the compile payload (observed: HTTP 413 from the TPU
    # tunnel's remote_compile at an 880 MB baked-in CSR) and defeats the
    # compile cache.

    def random_walk(self, starts, walk_len: int, key):
        """Uniform (or alias-weighted) first-order walks → [B, walk_len]."""
        return _random_walk(self._indptr, self._sorted_v,
                            getattr(self, "_alias", None),
                            jnp.asarray(starts, jnp.int32), key,
                            walk_len=walk_len)

    def metapath_walk(self, starts, metapath: Sequence[str],
                      walk_len: int, key):
        """Typed walks following a cyclic etype schedule (reference
        ``apps/PGLBox/src/graph.py`` metapath generation)."""
        if not self.is_hetero:
            raise ValueError("metapath_walk needs a HeterGraph walker")
        sched = tuple(self.etypes.index(et) for et in metapath)
        return _metapath_walk(self._indptr, self._sorted_v,
                              jnp.asarray(starts, jnp.int32), key,
                              sched=sched, walk_len=walk_len)

    def node2vec_walk(self, starts, walk_len: int, key, p: float = 1.0,
                      q: float = 1.0, tries: int = 8):
        """Second-order p/q-biased walks via device rejection sampling
        (same acceptance scheme as the C++ kernel,
        ``pgl/graph_kernel.pyx:142-224``): draw a uniform neighbor
        candidate, accept with weight 1/p (back to prev), 1 (distance 1:
        candidate is prev's neighbor), 1/q (distance 2). ``tries``
        rejection rounds per hop; falls back to the last candidate."""
        if not getattr(self, "neighbor_sorted", False):
            raise ValueError("node2vec needs DeviceWalker("
                             "neighbor_sorted=True)")
        return _node2vec_walk(self._indptr, self._sorted_v,
                              getattr(self, "_alias", None),
                              jnp.asarray(starts, jnp.int32), key,
                              walk_len=walk_len, p=p, q=q, tries=tries)


# -- jitted implementations (adjacency as traced args) ----------------------


def _hop(indptr, sorted_v, alias, cur, key, et=0):
    ip = indptr[et]
    lo = ip[cur]
    deg = ip[cur + 1] - lo
    k1, k2 = jax.random.split(key)
    r = jax.random.randint(k1, cur.shape, 0, 1 << 30) \
        % jnp.maximum(deg, 1)
    if alias is not None:
        probs, al = alias
        u = jax.random.uniform(k2, cur.shape)
        local = jnp.where(u < probs[lo + r], r, al[lo + r])
        nxt = sorted_v[lo + local]
    else:
        nxt = sorted_v[lo + r]
    return jnp.where(deg > 0, nxt, cur), deg > 0


@functools.partial(jax.jit, static_argnames=("walk_len",))
def _random_walk(indptr, sorted_v, alias, starts, key, *, walk_len: int):
    """Walks are -1-padded past a dead end — the same convention as the
    host C++ path (``sampling/walk.py``), so downstream pair generators
    (host ``skip_gram_gen_pair`` breaks on negatives) see identical
    walks from either path."""
    def step(carry, k):
        cur, alive = carry
        nxt, ok = _hop(indptr, sorted_v, alias, cur, k)
        alive = alive & ok
        nxt = jnp.where(alive, nxt, cur)
        return (nxt, alive), jnp.where(alive, nxt, -1)

    keys = jax.random.split(key, walk_len - 1)
    (_, _), tail = jax.lax.scan(
        step, (starts, jnp.ones_like(starts, dtype=bool)), keys)
    return jnp.concatenate([starts[None], tail]).T


@functools.partial(jax.jit, static_argnames=("sched", "walk_len"))
def _metapath_walk(indptr, sorted_v, starts, key, *, sched: tuple,
                   walk_len: int):
    ets = jnp.asarray([sched[i % len(sched)]
                       for i in range(walk_len - 1)], jnp.int32)

    def step(carry, inp):
        k, et = inp
        cur, alive = carry
        ip = indptr[et]
        lo = ip[cur]
        deg = ip[cur + 1] - lo
        r = jax.random.randint(k, cur.shape, 0, 1 << 30) \
            % jnp.maximum(deg, 1)
        nxt = sorted_v[lo + r]
        ok = deg > 0
        alive = alive & ok
        nxt = jnp.where(alive, nxt, cur)
        return (nxt, alive), jnp.where(alive, nxt, -1)

    keys = jax.random.split(key, walk_len - 1)
    (_, _), tail = jax.lax.scan(
        step, (starts, jnp.ones_like(starts, dtype=bool)),
        (keys, ets))
    return jnp.concatenate([starts[None], tail]).T


def _is_neighbor(indptr, sorted_v, u, x):
    """Vectorized binary search over neighbor-sorted adjacency."""
    ip = indptr[0]
    lo = ip[u]
    hi = ip[u + 1]

    def body(_, lh):
        lo, hi = lh
        mid = (lo + hi) // 2
        v = sorted_v[jnp.minimum(mid, len(sorted_v) - 1)]
        go_right = v < x
        return (jnp.where(go_right, mid + 1, lo),
                jnp.where(go_right, hi, mid))

    lo_f, _ = jax.lax.fori_loop(0, 32, body, (lo, hi))
    at = sorted_v[jnp.minimum(lo_f, len(sorted_v) - 1)]
    return (lo_f < hi) & (at == x)


@functools.partial(jax.jit,
                   static_argnames=("walk_len", "p", "q", "tries"))
def _node2vec_walk(indptr, sorted_v, alias, starts, key, *,
                   walk_len: int, p: float, q: float, tries: int):
    inv_p, inv_q = 1.0 / p, 1.0 / q
    m = max(inv_p, inv_q, 1.0)

    def hop(cur, prev, k):
        def trial(carry, kk):
            nxt, accepted = carry
            k1, k2 = jax.random.split(kk)
            cand, ok = _hop(indptr, sorted_v, alias, cur, k1)
            w = jnp.where(cand == prev, inv_p,
                          jnp.where(_is_neighbor(indptr, sorted_v,
                                                 prev, cand),
                                    1.0, inv_q))
            acc = (jax.random.uniform(k2, cur.shape) * m < w) & ok
            take = acc & ~accepted
            return (jnp.where(take, cand, nxt),
                    accepted | acc), None

        (nxt, accepted), _ = jax.lax.scan(
            trial, (cur, jnp.zeros_like(cur, dtype=bool)),
            jax.random.split(k, tries))
        # unaccepted after all tries: uniform fallback (dead if no edges)
        fb, ok = _hop(indptr, sorted_v, alias, cur,
                      jax.random.fold_in(k, 7))
        return jnp.where(accepted, nxt, jnp.where(ok, fb, cur)), \
            accepted | ok

    k0, key = jax.random.split(key)
    first, ok0 = _hop(indptr, sorted_v, alias, starts, k0)

    def step(carry, kk):
        cur, prev, alive = carry
        nxt, moved = hop(cur, prev, kk)
        alive = alive & moved
        nxt = jnp.where(alive, nxt, cur)
        return (nxt, cur, alive), jnp.where(alive, nxt, -1)

    keys = jax.random.split(key, max(walk_len - 2, 0))
    (_, _, _), tail = jax.lax.scan(step, (first, starts, ok0), keys)
    first_out = jnp.where(ok0, first, -1)
    return jnp.concatenate([starts[None], first_out[None], tail]).T


@functools.partial(jax.jit, static_argnames=("win",))
def skipgram_pairs(walks, win: int, key):
    """In-jit skip-gram pair generation from a [B, L] walk block.

    Mirrors the host C++ kernel (``pgl/graph_kernel.pyx:343-364``): each
    center position draws a random window size in [1, win] and pairs with
    positions within it. Returns (src, dst, valid) flattened to
    [B * L * 2 * win]; ``valid`` masks out-of-range and stalled positions.
    """
    B, L = walks.shape
    r = jax.random.randint(key, (B, L), 1, win + 1)
    idx = jnp.arange(L)
    pairs_src, pairs_dst, valid = [], [], []
    for sign in (1, -1):
        for o in range(1, win + 1):
            j = idx + sign * o
            ok = (j >= 0) & (j < L) & (o <= r)
            jc = jnp.clip(j, 0, L - 1)
            pairs_src.append(jnp.broadcast_to(walks, (B, L)))
            pairs_dst.append(jnp.take(walks, jc, axis=1))
            valid.append(ok)
    src = jnp.stack(pairs_src, 2).reshape(B, -1)
    dst = jnp.stack(pairs_dst, 2).reshape(B, -1)
    val = jnp.stack(valid, 2).reshape(B, -1)
    # dead-end tails are -1 (host-walk convention): mask them out
    val = val & (src >= 0) & (dst >= 0)
    return src.reshape(-1), dst.reshape(-1), val.reshape(-1)
