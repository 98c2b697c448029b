"""Sampling tests: graphsage_sample invariants, subgraph reindex golden
values, walks, device-side padded sampler."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pgl_tpu import Graph
from pgl_tpu.sampling import (graphsage_sample, subgraph, random_walk,
                              node2vec_walk, NeighborSampler,
                              sample_neighbors_padded)


def make_graph(n=50, e=300, seed=0, feat=True):
    rng = np.random.default_rng(seed)
    edges = rng.integers(0, n, (e, 2))
    nf = {"h": rng.normal(size=(n, 4)).astype(np.float32)} if feat else None
    return Graph(edges, num_nodes=n, node_feat=nf,
                 edge_feat={"w": rng.random(e).astype(np.float32)})


def test_subgraph_reindex():
    g = Graph(np.array([[0, 1], [1, 5], [5, 0], [2, 5]]), num_nodes=6,
              node_feat={"h": np.arange(12, dtype=np.float32).reshape(6, 2)},
              edge_feat={"w": np.arange(4, dtype=np.float32)})
    sub = subgraph(g, nodes=[5, 0, 1], eid=[0, 1, 2])
    assert sub.num_nodes == 3
    # edges reindexed: 0->1, 1->2, 5->0
    np.testing.assert_array_equal(np.asarray(sub.edges),
                                  [[1, 2], [2, 0], [0, 1]])
    np.testing.assert_allclose(sub.node_feat["h"][0], [10, 11])
    np.testing.assert_allclose(sub.edge_feat["w"], [0, 1, 2])


def test_subgraph_missing_node_raises():
    g = make_graph()
    with pytest.raises(ValueError):
        subgraph(g, nodes=[0], edges=np.asarray(g.edges)[:5])


def test_graphsage_sample_structure():
    g = make_graph()
    seeds = np.array([3, 7, 11])
    out = graphsage_sample(g, seeds, samples=[5, 3])
    assert len(out) == 2
    sg0, sample_index, node_index = out[0]
    # node_index points at the seeds inside the subgraph
    np.testing.assert_array_equal(sample_index[node_index], seeds)
    # every subgraph edge maps back to a real parent edge
    parent_edges = set(map(tuple, np.asarray(g.edges).tolist()))
    for sg, si, _ in out:
        for s, d in np.asarray(sg.edges):
            assert (int(si[s]), int(si[d])) in parent_edges
    # layer-0 subgraph contains at least the later layer's edges
    assert out[0][0].num_edges >= out[1][0].num_edges
    # sampled in-degree of seed nodes bounded by fan-out
    sg1 = out[1][0]
    indeg = sg1.indegree()
    np.testing.assert_array_less(indeg[np.asarray(node_index)], 5 + 1)


def test_graphsage_sample_ignore_edges():
    g = make_graph()
    seeds = np.array([3])
    full = graphsage_sample(g, seeds, samples=[100], seed=1)
    banned = {(int(s), int(d))
              for s, d in np.asarray(g.edges) if d == 3}
    out = graphsage_sample(g, seeds, samples=[100], ignore_edges=banned,
                           seed=1)
    sg, si, ni = out[0]
    for s, d in np.asarray(sg.edges):
        assert (int(si[s]), int(si[d])) not in banned
    assert sg.num_edges <= full[0][0].num_edges


def test_random_walk():
    g = make_graph(n=30, e=400)
    walks = random_walk(g, np.arange(30), walk_len=8, seed=2)
    assert walks.shape == (30, 8)
    np.testing.assert_array_equal(walks[:, 0], np.arange(30))
    succ = {i: set(v.tolist()) for i, v in enumerate(g.successor())}
    for row in walks:
        for a, b in zip(row[:-1], row[1:]):
            if b < 0:
                break
            assert b in succ[int(a)]


def test_node2vec_walk():
    g = make_graph(n=30, e=400)
    walks = node2vec_walk(g, np.arange(30), walk_len=6, p=2.0, q=0.5, seed=3)
    assert walks.shape == (30, 6)
    succ = {i: set(v.tolist()) for i, v in enumerate(g.successor())}
    for row in walks:
        for a, b in zip(row[:-1], row[1:]):
            if b < 0:
                break
            assert b in succ[int(a)]


def test_node2vec_walk_plus():
    from pgl_tpu.sampling import node2vec_walk_plus

    g = make_graph(n=30, e=400)
    walks = node2vec_walk_plus(g, np.arange(30), walk_len=6, p=0.5, q=2.0,
                               seed=3)
    assert walks.shape == (30, 6)
    succ = {i: set(v.tolist()) for i, v in enumerate(g.successor())}
    for row in walks:
        for a, b in zip(row[:-1], row[1:]):
            if b < 0:
                break
            assert b in succ[int(a)]
    # deterministic under a fixed seed
    again = node2vec_walk_plus(g, np.arange(30), walk_len=6, p=0.5, q=2.0,
                               seed=3)
    np.testing.assert_array_equal(walks, again)
    # p == q == 1 degrades to the uniform first-order walk (reference
    # pgl/sampling/walk.py:143-144)
    uni = node2vec_walk_plus(g, np.arange(5), walk_len=4, seed=1)
    np.testing.assert_array_equal(
        uni, __import__("pgl_tpu").sampling.random_walk(
            g, np.arange(5), 4, seed=1))


def test_sample_neighbors_padded():
    g = make_graph(n=40, e=200).tensor()
    idx = g.adj_dst_index
    nodes = jnp.arange(10, dtype=jnp.int32)
    neigh, mask = sample_neighbors_padded(idx.indptr, idx.sorted_v, nodes,
                                          k=4, key=jax.random.key(0))
    assert neigh.shape == (10, 4) and mask.shape == (10, 4)
    # sampled neighbors are true predecessors
    gn = g.numpy()
    preds = gn.predecessor()
    for i in range(10):
        if bool(mask[i, 0]):
            for v in np.asarray(neigh[i]):
                assert v in preds[i]


def test_neighbor_sampler_layers():
    g = make_graph(n=40, e=400)
    sampler = NeighborSampler(g.tensor(), samples=[3, 2])
    layers, frontier = sampler.sample(jnp.arange(5, dtype=jnp.int32),
                                      jax.random.key(1))
    assert len(layers) == 2
    (f1, n1, m1) = layers[-1]       # innermost (seeds)
    assert n1.shape == (5, 3)
    # jittable end-to-end
    f = jax.jit(lambda nodes, key: sampler.sample(nodes, key)[1])
    out = f(jnp.arange(5, dtype=jnp.int32), jax.random.key(2))
    assert out.shape == (5 * 3 * 2,)


def test_metapath_randomwalk():
    from pgl_tpu.heter_graph import HeterGraph
    from pgl_tpu.sampling import metapath_randomwalk
    # bipartite-ish: u2t edges from {0,1} -> {2,3}; t2u back
    edges = {
        "u2t": np.array([[0, 2], [0, 3], [1, 2]]),
        "t2u": np.array([[2, 0], [2, 1], [3, 0]]),
    }
    hg = HeterGraph(edges, num_nodes=4)
    walks = metapath_randomwalk(hg, [0, 1], "u2t-t2u", walk_length=5,
                                seed=0)
    assert walks.shape == (2, 5)
    # odd steps land on t-nodes {2,3}, even on u-nodes {0,1}
    for row in walks:
        for step, node in enumerate(row):
            if node < 0:
                continue
            assert node in ((2, 3) if step % 2 else (0, 1))


def test_graph_saint_node_sample():
    from pgl_tpu.sampling import graph_saint_node_sample
    g = make_graph(n=40, e=300)
    sub, nodes = graph_saint_node_sample(g, [1, 5, 9, 13, 17, 21, 25])
    assert sub.num_nodes == 7
    # every kept edge's endpoints are inside the node set
    parent = np.asarray(g.edges)
    kept = set(map(tuple, parent[np.isin(parent[:, 0], nodes)
                                 & np.isin(parent[:, 1], nodes)].tolist()))
    got = set((int(nodes[s]), int(nodes[d]))
              for s, d in np.asarray(sub.edges))
    assert got == kept


def test_hetero_neighbor_sampler():
    from pgl_tpu.heter_graph import HeterGraph
    from pgl_tpu.sampling import HeteroNeighborSampler
    rng = np.random.default_rng(0)
    hg = HeterGraph({
        "a": rng.integers(0, 30, (100, 2)),
        "b": rng.integers(0, 30, (80, 2)),
    }, num_nodes=30).tensor()
    sampler = HeteroNeighborSampler(hg, samples=[3, 2])
    layers, frontier = sampler.sample(jnp.arange(4, dtype=jnp.int32),
                                      jax.random.key(0))
    assert len(layers) == 2
    frontier0, per_etype = layers[-1]
    assert set(per_etype) == {"a", "b"}
    neigh, mask = per_etype["a"]
    assert neigh.shape == (4, 3)


def test_random_walk_with_restart():
    from pgl_tpu.sampling import random_walk_with_restart
    rng = np.random.default_rng(0)
    g = Graph(rng.integers(0, 50, (400, 2)), num_nodes=50)
    walks = random_walk_with_restart(g, np.arange(10), depth=8, proba=0.5,
                                     seed=1)
    assert walks.shape == (10, 8)
    # every visited node is reachable (a real node id or -1 dead end)
    assert int(walks.max()) < 50


def test_pinsage_sample_structure():
    """Weighted layered sampling: per-layer subgraphs with normalized
    visit-count edge weights (reference Graph4Rec sampling.py:448-541)."""
    from pgl_tpu.sampling import pinsage_sample
    rng = np.random.default_rng(1)
    g = Graph(rng.integers(0, 80, (800, 2)), num_nodes=80)
    nodes = np.array([3, 7, 11])
    layers = pinsage_sample(g, nodes, samples=[6, 4], top_k=3, seed=2)
    assert len(layers) == 2
    sub, sample_index, node_index = layers[0]
    # query nodes resolve to themselves through the local index
    np.testing.assert_array_equal(sample_index[node_index], nodes)
    for sub, si, _ in layers:
        w = np.asarray(sub.edge_feat["weight"])
        assert sub.num_edges == len(w)
        if len(w):
            assert (w > 0).all()
            # per-dst weights normalized to ~1
            dst = np.asarray(sub.edges)[:, 1]
            for d in np.unique(dst):
                np.testing.assert_allclose(w[dst == d].sum(), 1.0,
                                           rtol=1e-5)
    # reference layer order: index 0 carries the largest cumulative set
    assert layers[0][0].num_edges >= layers[1][0].num_edges


def test_graph_saint_random_walk_sample():
    from pgl_tpu.sampling import graph_saint_random_walk_sample
    rng = np.random.default_rng(2)
    g = Graph(rng.integers(0, 60, (600, 2)), num_nodes=60)
    sub, nodes = graph_saint_random_walk_sample(g, np.arange(5),
                                                max_depth=6, seed=3)
    assert sub.num_nodes == len(nodes)
    # all roots kept, all internal edges present
    assert set(range(5)) <= set(nodes.tolist())
    kept = set(map(tuple, np.asarray(g.edges)[
        np.isin(np.asarray(g.edges), nodes).all(axis=1)].tolist()))
    got_globals = {(int(nodes[s]), int(nodes[d]))
                   for s, d in np.asarray(sub.edges).tolist()}
    assert got_globals == kept
