"""Device-side walk generation (reference parity: on-GPU walk generation
inside the PGLBox engine, ``apps/PGLBox/src/graph.py:84-106``)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from pgl_tpu import Graph, HeterGraph
from pgl_tpu.datasets import powerlaw_graph
from pgl_tpu.sampling import (DeviceWalker, skipgram_pairs, random_walk)


def _und(edges, n):
    e = np.concatenate([edges, edges[:, ::-1]], 0)
    return Graph(e, num_nodes=n)


def test_random_walk_follows_edges():
    g = powerlaw_graph(num_nodes=1000, avg_degree=8, feat_dim=0, seed=0)
    w = DeviceWalker(g)
    walks = np.asarray(w.random_walk(np.arange(256), 12,
                                     jax.random.key(0)))
    assert walks.shape == (256, 12)
    es = set(map(tuple, np.asarray(g.edges)))
    for row in walks:
        for a, b in zip(row[:-1], row[1:]):
            assert a == b or (a, b) in es


def test_random_walk_dead_end_pads_minus_one():
    # node 2 has no out-edges: positions past the dead end are -1, the
    # same convention as the host C++ walker (sampling/walk.py)
    g = Graph(np.array([[0, 1], [1, 2]]), num_nodes=4)
    w = DeviceWalker(g)
    walks = np.asarray(w.random_walk(np.array([2, 3, 0]), 5,
                                     jax.random.key(0)))
    assert walks[0, 0] == 2 and (walks[0, 1:] == -1).all()
    assert walks[1, 0] == 3 and (walks[1, 1:] == -1).all()
    # 0 -> 1 -> 2 -> dead
    assert list(walks[2, :3]) == [0, 1, 2] and (walks[2, 3:] == -1).all()
    # parity with the host path on the same graph
    host = random_walk(g, np.array([2, 3, 0]), 5, seed=0)
    assert (np.asarray(host) < 0).sum() > 0
    assert ((walks < 0) == (np.asarray(host) < 0)).all()


def test_random_walk_uniform_distribution():
    # star: node 0 -> 1..20; one-hop frequencies ~ uniform
    e = np.stack([np.zeros(20, np.int64), np.arange(1, 21)], 1)
    g = Graph(e, num_nodes=21)
    w = DeviceWalker(g)
    walks = np.asarray(w.random_walk(np.zeros(8000, np.int32), 2,
                                     jax.random.key(1)))
    counts = np.bincount(walks[:, 1], minlength=21)[1:]
    assert counts.min() > 8000 / 20 * 0.6
    assert counts.max() < 8000 / 20 * 1.5


def test_weighted_walk_alias_bias():
    # node 0 -> 1 (w=9), 0 -> 2 (w=1): ~90/10 split
    e = np.array([[0, 1], [0, 2]])
    g = Graph(e, num_nodes=3,
              edge_feat={"w": np.array([9.0, 1.0], np.float32)})
    w = DeviceWalker(g, weighted="w")
    walks = np.asarray(w.random_walk(np.zeros(4000, np.int32), 2,
                                     jax.random.key(0)))
    frac1 = np.mean(walks[:, 1] == 1)
    assert 0.85 < frac1 < 0.95


def test_weighted_walk_neighbor_sorted_alias_bias():
    """Regression: with neighbor_sorted=True the neighborhood arrays are
    re-sorted by dst id, and the alias tables must be built from weights
    permuted the same way — previously they were built in original CSR
    edge order, attaching weights to the wrong neighbors."""
    # node 0 -> 2 (w=999), 0 -> 1 (w=1): edge order is the REVERSE of
    # dst-sorted order, so an unpermuted weight array flips the bias
    e = np.array([[0, 2], [0, 1]])
    g = Graph(e, num_nodes=3,
              edge_feat={"w": np.array([999.0, 1.0], np.float32)})
    w = DeviceWalker(g, neighbor_sorted=True, weighted="w")
    walks = np.asarray(w.random_walk(np.zeros(2000, np.int32), 2,
                                     jax.random.key(0)))
    frac2 = np.mean(walks[:, 1] == 2)
    assert frac2 > 0.99
    # and the weighted node2vec path (which requires neighbor_sorted)
    walks = np.asarray(w.node2vec_walk(np.zeros(2000, np.int32), 3,
                                       jax.random.key(1), p=1.0, q=1.0))
    assert np.mean(walks[:, 1] == 2) > 0.99


def test_node2vec_p_bias():
    rng = np.random.default_rng(0)
    g = _und(rng.integers(0, 500, (3000, 2)), 500)
    w = DeviceWalker(g, neighbor_sorted=True)
    back = {}
    for p in (0.1, 10.0):
        n2v = np.asarray(w.node2vec_walk(np.arange(500), 10,
                                         jax.random.key(1), p=p, q=1.0))
        back[p] = float(np.mean(n2v[:, 2] == n2v[:, 0]))
        es = set(map(tuple, np.asarray(g.edges)))
        for row in n2v[:50]:
            for a, b in zip(row[:-1], row[1:]):
                assert a == b or (a, b) in es
    assert back[0.1] > 5 * back[10.0]


def test_node2vec_requires_sorted():
    g = powerlaw_graph(num_nodes=100, avg_degree=4, feat_dim=0, seed=0)
    w = DeviceWalker(g)
    with pytest.raises(ValueError):
        w.node2vec_walk(np.arange(4), 5, jax.random.key(0))


def test_metapath_walk_respects_types():
    # bipartite-ish: u2i edges 0..9 -> 10..19, i2u back
    rng = np.random.default_rng(0)
    u2i = np.stack([rng.integers(0, 10, 200),
                    rng.integers(10, 20, 200)], 1)
    i2u = u2i[:, ::-1]
    hg = HeterGraph({"u2i": u2i, "i2u": i2u}, num_nodes=20)
    w = DeviceWalker(hg)
    walks = np.asarray(w.metapath_walk(np.arange(10), ["u2i", "i2u"], 7,
                                       jax.random.key(0)))
    # alternating node spaces: even positions < 10, odd in [10, 20)
    assert (walks[:, 0::2] < 10).all()
    assert (walks[:, 1::2] >= 10).all()


def test_skipgram_pairs_windows_and_masks():
    walks = jnp.asarray(np.array([[1, 2, 3, 4]]))
    src, dst, val = skipgram_pairs(walks, 2, jax.random.key(0))
    src, dst, val = map(np.asarray, (src, dst, val))
    assert ((src != dst) | ~val).all()
    # every valid pair is within window 2 of the walk
    pos = {1: 0, 2: 1, 3: 2, 4: 3}
    for s, d, v in zip(src, dst, val):
        if v:
            assert abs(pos[int(s)] - pos[int(d)]) <= 2


def test_matches_host_walk_distribution():
    """Device and host walkers sample from the same process: compare
    one-hop transition frequencies on a small graph."""
    rng = np.random.default_rng(3)
    g = _und(rng.integers(0, 30, (200, 2)), 30)
    w = DeviceWalker(g)
    dev = np.asarray(w.random_walk(np.repeat(np.arange(30), 200), 2,
                                   jax.random.key(0)))
    host = random_walk(g, np.repeat(np.arange(30), 200), 2, seed=0)
    for start in range(5):
        a = dev[dev[:, 0] == start][:, 1]
        b = np.asarray(host)[np.asarray(host)[:, 0] == start][:, 1]
        ca = np.bincount(a, minlength=30) / max(len(a), 1)
        cb = np.bincount(b, minlength=30) / max(len(b), 1)
        assert np.abs(ca - cb).max() < 0.15
