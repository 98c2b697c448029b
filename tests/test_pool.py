"""Pooling layers + transforms, mirroring reference ``tests/test_pool.py`` /
``tests/test_transform.py`` coverage with golden values on tiny batches."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from pgl_tpu import Graph
import pgl_tpu.nn as gnn
from pgl_tpu.utils.transform import (to_undirected, add_self_loops,
                                     to_dense_batch, filter_adj)


def batched_graph():
    g1 = Graph(np.array([[0, 1], [1, 0]]), num_nodes=2,
               node_feat={"h": np.array([[1.0, 2], [3, 4]], np.float32)})
    g2 = Graph(np.array([[0, 1], [1, 2], [2, 0]]), num_nodes=3,
               node_feat={"h": np.array([[5.0, 6], [7, 8], [9, 10]],
                                        np.float32)})
    return Graph.disjoint([g1, g2]).tensor()


def test_graph_pool_golden():
    g = batched_graph()
    out = gnn.GraphPool("sum").apply({}, g, g.node_feat["h"])
    np.testing.assert_allclose(np.asarray(out), [[4, 6], [21, 24]])
    out = gnn.GraphPool("mean").apply({}, g, g.node_feat["h"])
    np.testing.assert_allclose(np.asarray(out), [[2, 3], [7, 8]])
    out = gnn.GraphPool("max").apply({}, g, g.node_feat["h"])
    np.testing.assert_allclose(np.asarray(out), [[3, 4], [9, 10]])


def test_graph_norm():
    g = batched_graph()
    out = gnn.GraphNorm().apply({}, g, g.node_feat["h"])
    h = np.asarray(g.node_feat["h"])
    exp = h / np.sqrt(np.array([2, 2, 3, 3, 3]))[:, None]
    np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-6)


def test_set2set():
    g = batched_graph()
    layer = gnn.Set2Set(input_dim=2, n_iters=3)
    variables = layer.init(jax.random.key(0), g, g.node_feat["h"])
    out = layer.apply(variables, g, g.node_feat["h"])
    assert out.shape == (2, 4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_global_attention():
    g = batched_graph()
    layer = gnn.GlobalAttention(gate=nn.Dense(1), feat_nn=nn.Dense(6))
    variables = layer.init(jax.random.key(0), g, g.node_feat["h"])
    out = layer.apply(variables, g, g.node_feat["h"])
    assert out.shape == (2, 6)


def test_sag_pool():
    g = batched_graph()
    layer = gnn.SAGPool(input_dim=2, ratio=0.5)
    variables = layer.init(jax.random.key(0), g, g.node_feat["h"])
    x, batch, newg = layer.apply(variables, g, g.node_feat["h"])
    # ceil(0.5*2)=1 + ceil(0.5*3)=2 nodes survive
    assert x.shape[0] == 3
    assert newg.num_graph == 2
    assert newg.num_nodes == 3


def test_gmt_pool():
    g = batched_graph()
    layer = gnn.GraphMultisetTransformer(
        input_dim=2, hidden_dim=8, output_dim=4, num_nodes=3, num_heads=2)
    variables = layer.init(jax.random.key(0), g, g.node_feat["h"])
    out = layer.apply(variables, g, g.node_feat["h"])
    assert out.shape == (2, 4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_to_undirected():
    g = Graph(np.array([[0, 1], [0, 1], [2, 0]]), num_nodes=3,
              node_feat={"h": np.ones((3, 2), np.float32)})
    u = to_undirected(g)
    edges = set(map(tuple, np.asarray(u.edges).tolist()))
    assert edges == {(0, 1), (1, 0), (2, 0), (0, 2)}
    assert "h" in u.node_feat


def test_add_self_loops():
    g = Graph(np.array([[0, 1], [1, 1]]), num_nodes=3)
    s = add_self_loops(g)
    assert s.num_edges == 5
    s = add_self_loops(g, replace=True)
    # old self-loop (1,1) removed, 3 fresh loops + (0,1)
    assert s.num_edges == 4
    edges = set(map(tuple, np.asarray(s.edges).tolist()))
    assert edges == {(0, 0), (1, 1), (2, 2), (0, 1)}


def test_to_dense_batch():
    g = batched_graph()
    out, mask = to_dense_batch(g.node_feat["h"], g)
    assert out.shape == (2, 3, 2)
    np.testing.assert_allclose(np.asarray(out[0, :2]), [[1, 2], [3, 4]])
    np.testing.assert_allclose(np.asarray(out[0, 2]), [0, 0])
    # mask True at dummy positions (reference contract)
    np.testing.assert_array_equal(np.asarray(mask),
                                  [[False, False, True],
                                   [False, False, False]])


def test_filter_adj():
    edges = np.array([[0, 1], [1, 2], [2, 3], [3, 0]])
    out, attr = filter_adj(edges, np.array([0, 1, 3]), num_nodes=4,
                           edge_attr=np.array([10., 20, 30, 40]))
    np.testing.assert_array_equal(out, [[0, 1], [2, 0]])
    np.testing.assert_allclose(attr, [10.0, 40.0])


def test_drop_edge():
    from pgl_tpu.utils.transform import drop_edge
    g = Graph(np.random.default_rng(0).integers(0, 20, (400, 2)),
              num_nodes=20,
              edge_feat={"w": np.arange(400, dtype=np.float32)})
    g2 = drop_edge(g, rate=0.5, seed=1)
    assert 100 < g2.num_edges < 300
    assert g2.edge_feat["w"].shape == (g2.num_edges,)
    # kept edges are a subset of originals
    orig = set(map(tuple, np.asarray(g.edges).tolist()))
    assert all(tuple(e) in orig for e in np.asarray(g2.edges).tolist())


def test_sag_pool_static_jits():
    g = batched_graph()
    layer = gnn.SAGPool(input_dim=2, ratio=0.5, static=True)
    variables = layer.init(jax.random.key(0), g, g.node_feat["h"])

    @jax.jit
    def f(v, g, x):
        return layer.apply(v, g, x)

    x, keep, newg = f(variables, g.tensor(), g.node_feat["h"])
    # same survivors as the dynamic path: ceil(0.5*2)+ceil(0.5*3)=3 nodes
    assert int(np.asarray(keep).sum()) == 3
    assert x.shape == g.node_feat["h"].shape
    # dropped nodes' features are zeroed in place
    np.testing.assert_allclose(np.asarray(x)[~np.asarray(keep)], 0.0)
