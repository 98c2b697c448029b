"""ctypes bindings for the C++ host graph kernels (``graph_kernel.cc``).

Auto-compiles the shared library on first import (g++ is part of the baked
toolchain); every entry point has a documented pure-numpy fallback used when
compilation is unavailable, so the framework never hard-fails.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "graph_kernel.cc")
_SO = os.path.join(_HERE, "libgraph_kernel.so")

_lib = None
_lock = threading.Lock()
_build_failed = False

_i64 = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")
_f64 = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
_ll = ctypes.c_longlong
_d = ctypes.c_double


def _compile() -> bool:
    # compile to a temp name and rename atomically: concurrent importers
    # (dataloader workers, multi-host jobs on shared FS) must never dlopen
    # a half-written library
    tmp = f"{_SO}.tmp.{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
             _SRC, "-o", tmp],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            if not _compile() and not os.path.exists(_SO):
                # rebuild failed AND no prior library — a stale-but-
                # loadable .so (e.g. prebuilt, shipped to a g++-less
                # host whose checkout re-stamped the source mtime) is
                # still far better than losing the native path
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.build_index.argtypes = [_i64, _i64, _ll, _ll, _i64, _i64, _i64, _i64]
        lib.map_nodes.argtypes = [_i64, _ll, _i64, _ll, _i64]
        lib.sample_subset_with_eid.argtypes = [
            _i64, _i64, _i64, _i64, _ll, _ll, _ll, _i64, _i64, _i64]
        lib.random_walk.argtypes = [_i64, _i64, _i64, _ll, _ll, _ll, _i64]
        lib.node2vec_walk.argtypes = [
            _i64, _i64, _i64, _ll, _ll, _d, _d, _ll, _i64]
        lib.node2vec_walk_plus.argtypes = [
            _i64, _i64, _i64, _ll, _ll, _d, _d, _ll, _i64]
        lib.skip_gram_gen_pair.argtypes = [_i64, _ll, _ll, _ll, _ll, _i64, _i64]
        lib.skip_gram_gen_pair.restype = _ll
        lib.alias_sample_build_table.argtypes = [_f64, _ll, _f64, _i64]
        lib.extract_edges_from_nodes.argtypes = [
            _i64, _i64, _i64, _ll, _i64, _ll, _i64]
        lib.extract_edges_from_nodes.restype = _ll
        lib.metis_style_partition.argtypes = [_i64, _i64, _ll, _ll, _ll, _i64]
        try:
            # round-5 symbol: a stale prebuilt .so (the g++-less-host
            # fallback this loader deliberately supports) may predate it
            # — degrade to unweighted partitioning, never hard-fail
            lib.metis_style_partition_w.argtypes = [
                _i64, _i64, _i64, _ll, _ll, _ll, _i64]
            lib._has_vwgt = True
        except AttributeError:
            lib._has_vwgt = False
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _c(a):
    return np.ascontiguousarray(a, dtype=np.int64)


def build_index(u, v, num_nodes):
    """O(E) CSR build. Returns (degree, sorted_v, sorted_eid, indptr)."""
    lib = _load()
    u, v = _c(u), _c(v)
    E, N = len(u), int(num_nodes)
    if lib is not None:
        degree = np.empty(N, dtype=np.int64)
        sorted_v = np.empty(E, dtype=np.int64)
        sorted_eid = np.empty(E, dtype=np.int64)
        indptr = np.empty(N + 1, dtype=np.int64)
        lib.build_index(u, v, E, N, degree, sorted_v, sorted_eid, indptr)
        return degree, sorted_v, sorted_eid, indptr
    # numpy fallback: stable argsort (O(E log E))
    degree = np.bincount(u, minlength=N).astype(np.int64)
    indptr = np.zeros(N + 1, dtype=np.int64)
    np.cumsum(degree, out=indptr[1:])
    order = np.argsort(u, kind="stable")
    return degree, v[order], order.astype(np.int64), indptr


def map_nodes(nodes, query):
    """Reindex ``query`` global ids to positions in ``nodes`` (-1 if absent)."""
    lib = _load()
    nodes, query = _c(nodes), _c(query)
    out = np.empty(len(query), dtype=np.int64)
    if lib is not None:
        lib.map_nodes(nodes, len(nodes), query, len(query), out)
        return out
    # first occurrence wins on duplicate ids — matching the C++
    # unordered_map::emplace semantics, so results don't change with
    # the backend
    lut = {}
    for i, n in enumerate(nodes):
        lut.setdefault(int(n), i)
    for i, q in enumerate(query):
        out[i] = lut.get(int(q), -1)
    return out


def sample_subset_with_eid(indptr, sorted_v, sorted_eid, query, max_degree,
                           seed=0):
    """Uniform ≤max_degree neighbor sample per query node (no replacement).

    Returns (out_indptr [Q+1], out_v, out_eid) — packed ragged arrays.
    """
    lib = _load()
    indptr, sorted_v, sorted_eid, query = map(_c, (indptr, sorted_v,
                                                   sorted_eid, query))
    Q = len(query)
    cap = Q * int(max_degree)
    out_indptr = np.empty(Q + 1, dtype=np.int64)
    out_v = np.empty(cap, dtype=np.int64)
    out_eid = np.empty(cap, dtype=np.int64)
    if lib is not None:
        lib.sample_subset_with_eid(indptr, sorted_v, sorted_eid, query, Q,
                                   int(max_degree), int(seed), out_indptr,
                                   out_v, out_eid)
        n = out_indptr[-1]
        return out_indptr, out_v[:n], out_eid[:n]
    rng = np.random.default_rng(seed)
    cursor = 0
    out_indptr[0] = 0
    for qi, node in enumerate(query):
        lo, hi = indptr[node], indptr[node + 1]
        deg = hi - lo
        if deg <= max_degree:
            sel = np.arange(lo, hi)
        else:
            sel = lo + rng.choice(deg, size=max_degree, replace=False)
        k = len(sel)
        out_v[cursor:cursor + k] = sorted_v[sel]
        out_eid[cursor:cursor + k] = sorted_eid[sel]
        cursor += k
        out_indptr[qi + 1] = cursor
    return out_indptr, out_v[:cursor], out_eid[:cursor]


def _check_walk_len(walk_len):
    if int(walk_len) < 1:
        raise ValueError(f"walk_len must be >= 1, got {walk_len}")


def random_walk(indptr, sorted_v, starts, walk_len, seed=0):
    """First-order walks [num_starts, walk_len]; -1 pads dead ends."""
    _check_walk_len(walk_len)
    lib = _load()
    indptr, sorted_v, starts = map(_c, (indptr, sorted_v, starts))
    W = len(starts)
    walks = np.empty(W * walk_len, dtype=np.int64)
    if lib is not None:
        lib.random_walk(indptr, sorted_v, starts, W, int(walk_len), int(seed),
                        walks)
        return walks.reshape(W, walk_len)
    rng = np.random.default_rng(seed)
    walks = walks.reshape(W, walk_len)
    for w, start in enumerate(starts):
        cur = start
        walks[w, 0] = cur
        for step in range(1, walk_len):
            lo, hi = indptr[cur], indptr[cur + 1]
            if lo == hi:
                walks[w, step:] = -1
                break
            cur = sorted_v[rng.integers(lo, hi)]
            walks[w, step] = cur
    return walks


def node2vec_walk(indptr, sorted_v, starts, walk_len, p=1.0, q=1.0, seed=0):
    """Second-order p/q biased walks via rejection sampling."""
    _check_walk_len(walk_len)
    lib = _load()
    indptr, sorted_v, starts = map(_c, (indptr, sorted_v, starts))
    W = len(starts)
    walks = np.empty(W * walk_len, dtype=np.int64)
    if lib is not None:
        lib.node2vec_walk(indptr, sorted_v, starts, W, int(walk_len),
                          float(p), float(q), int(seed), walks)
        return walks.reshape(W, walk_len)
    # numpy fallback: exact second-order probabilities per step (slow but
    # correct — the module contract is degrade, never hard-fail)
    rng = np.random.default_rng(seed)
    walks = walks.reshape(W, walk_len)
    inv_p, inv_q = 1.0 / p, 1.0 / q
    for w, start in enumerate(starts):
        prev, cur = -1, int(start)
        walks[w, 0] = cur
        for step in range(1, walk_len):
            lo, hi = int(indptr[cur]), int(indptr[cur + 1])
            if lo == hi:
                walks[w, step:] = -1
                break
            nbrs = sorted_v[lo:hi]
            if prev < 0:
                nxt = int(nbrs[rng.integers(len(nbrs))])
            else:
                pset = set(sorted_v[int(indptr[prev]):
                                    int(indptr[prev + 1])].tolist())
                wts = np.where(
                    nbrs == prev, inv_p,
                    np.where(np.fromiter((int(x) in pset for x in nbrs),
                                         bool, len(nbrs)), 1.0, inv_q))
                nxt = int(nbrs[rng.choice(len(nbrs), p=wts / wts.sum())])
            walks[w, step] = nxt
            prev, cur = cur, nxt
    return walks


def node2vec_walk_plus(indptr, sorted_v, starts, walk_len, p=1.0, q=1.0,
                       seed=0):
    """node2vec+ walks: the distance-1 bias class is the union of all
    neighborhoods seen so far in the walk (not just the previous node's)."""
    _check_walk_len(walk_len)
    lib = _load()
    indptr, sorted_v, starts = map(_c, (indptr, sorted_v, starts))
    W = len(starts)
    walks = np.empty(W * walk_len, dtype=np.int64)
    if lib is not None:
        lib.node2vec_walk_plus(indptr, sorted_v, starts, W, int(walk_len),
                               float(p), float(q), int(seed), walks)
        return walks.reshape(W, walk_len)
    # numpy fallback: exact-probability sampling per step
    rng = np.random.default_rng(seed)
    walks = walks.reshape(W, walk_len)
    for w, start in enumerate(starts):
        seen = set()
        prev, cur = -1, int(start)
        walks[w, 0] = cur
        for step in range(1, walk_len):
            lo, hi = int(indptr[cur]), int(indptr[cur + 1])
            if lo == hi:
                walks[w, step:] = -1
                break
            succ = sorted_v[lo:hi]
            if prev < 0:
                nxt = int(succ[rng.integers(len(succ))])
            else:
                probs = np.where(
                    succ == prev, 1.0 / p,
                    np.array([1.0 if int(s) in seen else 1.0 / q
                              for s in succ]))
                probs /= probs.sum()
                nxt = int(succ[rng.choice(len(succ), p=probs)])
            seen.update(int(s) for s in succ)
            walks[w, step] = nxt
            prev, cur = cur, nxt
    return walks


def skip_gram_gen_pair(walks, max_win, seed=0):
    """(src, dst) positive pairs with a per-position random window."""
    lib = _load()
    walks = _c(walks)
    W, L = walks.shape
    cap = W * L * int(max_win)
    src = np.empty(cap, dtype=np.int64)
    dst = np.empty(cap, dtype=np.int64)
    if lib is not None:
        n = lib.skip_gram_gen_pair(walks.reshape(-1), W, L, int(max_win),
                                   int(seed), src, dst)
        return src[:n], dst[:n]
    rng = np.random.default_rng(seed)
    cnt = 0
    for w in range(W):
        for t in range(L):
            if walks[w, t] < 0:
                break
            win = rng.integers(1, max_win + 1)
            for b in range(1, min(win, t) + 1):
                if walks[w, t - b] < 0:
                    continue
                src[cnt] = walks[w, t]
                dst[cnt] = walks[w, t - b]
                cnt += 1
    return src[:cnt], dst[:cnt]


def alias_sample_build_table(weights):
    """O(n) alias table. Returns (events float64[n], alias int64[n])."""
    lib = _load()
    weights = np.ascontiguousarray(weights, dtype=np.float64)
    n = len(weights)
    events = np.empty(n, dtype=np.float64)
    alias = np.empty(n, dtype=np.int64)
    if lib is not None:
        lib.alias_sample_build_table(weights, n, events, alias)
        return events, alias
    total = float(weights.sum())
    if not total > 0.0:
        events[:] = 1.0
        alias[:] = np.arange(n)
        return events, alias
    scaled = weights * n / total
    small = [i for i in range(n) if scaled[i] < 1.0]
    large = [i for i in range(n) if scaled[i] >= 1.0]
    while small and large:
        s, l = small.pop(), large.pop()
        events[s] = scaled[s]
        alias[s] = l
        scaled[l] += scaled[s] - 1.0
        (small if scaled[l] < 1.0 else large).append(l)
    for i in large + small:
        events[i] = 1.0
        alias[i] = i
    return events, alias


def alias_sample(events, alias, num, seed=0):
    """Draw ``num`` indices from an alias table."""
    rng = np.random.default_rng(seed)
    n = len(events)
    idx = rng.integers(0, n, size=num)
    coin = rng.random(num)
    return np.where(coin < events[idx], idx, alias[idx])


def extract_edges_from_nodes(indptr, sorted_v, sorted_eid, num_nodes_graph,
                             nodes):
    """All edge ids whose endpoints both lie in ``nodes`` (induced subgraph)."""
    lib = _load()
    indptr, sorted_v, sorted_eid, nodes = map(_c, (indptr, sorted_v,
                                                   sorted_eid, nodes))
    cap = int((indptr[nodes + 1] - indptr[nodes]).sum())
    out = np.empty(max(cap, 1), dtype=np.int64)
    if lib is not None:
        n = lib.extract_edges_from_nodes(indptr, sorted_v, sorted_eid,
                                         int(num_nodes_graph), nodes,
                                         len(nodes), out)
        return out[:n]
    in_set = np.zeros(num_nodes_graph, dtype=bool)
    in_set[nodes] = True
    keep = []
    for u in nodes:
        for e in range(indptr[u], indptr[u + 1]):
            if in_set[sorted_v[e]]:
                keep.append(sorted_eid[e])
    return np.asarray(keep, dtype=np.int64)


def metis_partition(indptr, adj, nparts, seed=0, vwgt=None):
    """Multilevel k-way partition (own METIS-style implementation in C++:
    heavy-edge-matching coarsening + greedy growth + boundary refinement).
    ``vwgt``: optional int64[num_nodes] balance weights (e.g. degrees so
    every part carries ~equal edge mass). Returns parts int64[num_nodes]."""
    lib = _load()
    indptr, adj = _c(indptr), _c(adj)
    n = len(indptr) - 1
    parts = np.empty(n, dtype=np.int64)
    if lib is not None:
        if vwgt is not None and getattr(lib, "_has_vwgt", False):
            lib.metis_style_partition_w(indptr, adj, _c(vwgt), n,
                                        int(nparts), int(seed), parts)
        else:
            if vwgt is not None:
                import warnings
                warnings.warn(
                    "libgraph_kernel.so predates weighted partitioning; "
                    "falling back to unweighted balance")
            lib.metis_style_partition(indptr, adj, n, int(nparts),
                                      int(seed), parts)
        return parts
    # numpy fallback: BFS-grown balanced blocks — far weaker cuts than
    # the multilevel C++ path but a valid partition on g++-less hosts
    # (the module contract is degrade, never hard-fail)
    from collections import deque
    target = -(-n // int(nparts))
    parts[:] = -1
    rng = np.random.default_rng(seed)
    order = rng.permutation(n)
    part, size = 0, 0
    for root in order:
        if parts[root] >= 0:
            continue
        dq = deque([int(root)])
        while dq and part < int(nparts):
            v = dq.popleft()
            if parts[v] >= 0:
                continue
            parts[v] = part
            size += 1
            if size >= target and part < int(nparts) - 1:
                part += 1
                size = 0
                dq.clear()
                break
            dq.extend(int(x) for x in adj[indptr[v]:indptr[v + 1]]
                      if parts[x] < 0)
    parts[parts < 0] = int(nparts) - 1
    return parts
