"""Random-walk sampling (reference: ``pgl/sampling/walk.py``).

``random_walk`` (``walk.py:23``) and ``node2vec_walk`` (``walk.py:67``) run on
the C++ host kernels; the reference returns ragged Python lists, we return a
dense ``[num_nodes, walk_len]`` int64 array padded with -1 at dead ends (the
shape the device pipeline wants) plus list-of-lists helpers for parity.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ..native import graph_kernel as native

__all__ = ["random_walk", "node2vec_walk", "walks_to_lists"]


def _csr(graph):
    idx = graph.adj_src_index
    return np.asarray(idx.indptr), np.asarray(idx.sorted_v)


def random_walk(graph, nodes, walk_len: int, seed: int = 0,
                as_list: bool = False):
    """Uniform first-order walks from ``nodes``; -1-padded matrix
    (or ragged lists with ``as_list=True``, matching the reference)."""
    if graph.is_tensor:
        raise ValueError("You must call Graph.numpy() first.")
    indptr, sorted_v = _csr(graph)
    walks = native.random_walk(indptr, sorted_v, np.asarray(nodes),
                               walk_len, seed)
    return walks_to_lists(walks) if as_list else walks


def node2vec_walk(graph, nodes, walk_len: int, p: float = 1.0,
                  q: float = 1.0, seed: int = 0, as_list: bool = False):
    """Second-order biased walks (return parameter ``p``, in-out ``q``) via
    rejection sampling (O(1) per step vs the reference's per-step alias
    rebuild, ``pgl/graph_kernel.pyx:142-224``)."""
    if graph.is_tensor:
        raise ValueError("You must call Graph.numpy() first.")
    indptr, sorted_v = _csr(graph)
    walks = native.node2vec_walk(indptr, sorted_v, np.asarray(nodes),
                                 walk_len, p, q, seed)
    return walks_to_lists(walks) if as_list else walks


def walks_to_lists(walks: np.ndarray) -> List[List[int]]:
    """Strip -1 padding into ragged python lists."""
    out = []
    for row in walks:
        stop = np.argmax(row < 0) if (row < 0).any() else len(row)
        out.append(row[:stop].tolist())
    return out
