"""Layer-zoo tests: shape/dtype smoke on every conv (mirroring the reference
``tests/test_conv.py:24-71``) plus golden-value checks for the parameter-free
propagation layers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pgl_tpu import Graph
import pgl_tpu.nn as gnn
import pgl_tpu.nn.functional as GF


N, E, D = 10, 40, 8
rng = np.random.default_rng(0)
EDGES = rng.integers(0, N, (E, 2))
FEAT = rng.normal(size=(N, D)).astype(np.float32)


@pytest.fixture(scope="module")
def graph():
    return Graph(EDGES, num_nodes=N, node_feat={"h": FEAT}).tensor()


def init_and_apply(layer, graph, *args, **kwargs):
    variables = layer.init(jax.random.key(0), graph, *args, **kwargs)
    out = layer.apply(variables, graph, *args, **kwargs)
    return out


@pytest.mark.parametrize("aggr", ["sum", "mean", "max", "min"])
def test_graphsage(graph, aggr):
    out = init_and_apply(
        gnn.GraphSageConv(D, 16, aggr_func=aggr), graph,
        graph.node_feat["h"])
    assert out.shape == (N, 16)
    # normalize=True -> unit rows (or zero rows)
    norms = np.linalg.norm(np.asarray(out), axis=1)
    assert np.all((np.abs(norms - 1) < 1e-4) | (norms < 1e-6))


def test_pinsage(graph):
    efeat = jnp.ones((E, 1), jnp.float32)
    out = init_and_apply(gnn.PinSageConv(D, 16), graph,
                         graph.node_feat["h"], efeat)
    assert out.shape == (N, 16)


@pytest.mark.parametrize("out_dim", [4, 16])
def test_gcn_shapes(graph, out_dim):
    # out_dim < D exercises linear-before-propagate; > D the other branch.
    out = init_and_apply(gnn.GCNConv(D, out_dim), graph,
                         graph.node_feat["h"])
    assert out.shape == (N, out_dim)


def test_gcn_matches_manual(graph):
    layer = gnn.GCNConv(D, 4, norm=True)
    variables = layer.init(jax.random.key(0), graph, graph.node_feat["h"])
    out = layer.apply(variables, graph, graph.node_feat["h"])
    W = np.asarray(variables["params"]["linear"]["kernel"])
    b = np.asarray(variables["params"]["bias"])
    deg = np.maximum(np.asarray(graph.indegree()), 1).astype(np.float64)
    norm = deg ** -0.5
    h = FEAT @ W  # input_size > output_size: linear first
    h = h * norm[:, None]
    agg = np.zeros_like(h)
    for s, d in EDGES:
        agg[d] += h[s]
    exp = agg * norm[:, None] + b
    np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-4)


@pytest.mark.parametrize("heads,concat", [(1, True), (4, True), (4, False)])
def test_gat(graph, heads, concat):
    out = init_and_apply(
        gnn.GATConv(D, 6, num_heads=heads, concat=concat,
                    feat_drop=0.0, attn_drop=0.0),
        graph, graph.node_feat["h"])
    assert out.shape == (N, 6 * heads if concat else 6)
    assert np.all(np.isfinite(np.asarray(out)))


def test_gatv2(graph):
    out = init_and_apply(
        gnn.GATv2Conv(D, 6, num_heads=3, feat_drop=0.0, attn_drop=0.0),
        graph, graph.node_feat["h"])
    assert out.shape == (N, 18)


def test_appnp(graph):
    out = init_and_apply(gnn.APPNP(alpha=0.2, k_hop=3), graph,
                         graph.node_feat["h"])
    assert out.shape == (N, D)
    # alpha=1 returns the input unchanged
    out = init_and_apply(gnn.APPNP(alpha=1.0, k_hop=3), graph,
                         graph.node_feat["h"])
    np.testing.assert_allclose(np.asarray(out), FEAT, rtol=1e-5)


@pytest.mark.parametrize("init_method", ["PPR", "SGC", "NPPR", "Random"])
def test_gpr(graph, init_method):
    alpha = 2 if init_method == "SGC" else 0.1
    out = init_and_apply(
        gnn.GPRConv(D, 16, 5, drop=0.0, dprate=0.0, k_hop=4, alpha=alpha,
                    init_method=init_method),
        graph, graph.node_feat["h"])
    assert out.shape == (N, 5)


def test_gcnii(graph):
    out = init_and_apply(gnn.GCNII(D, k_hop=4, dropout=0.0), graph,
                         graph.node_feat["h"])
    assert out.shape == (N, D)


@pytest.mark.parametrize("gate,edge_feat", [(False, False), (True, True)])
def test_transformer_conv(graph, gate, edge_feat):
    H, hidden = 2, 4
    ef = jnp.asarray(rng.normal(size=(E, H * hidden)).astype(np.float32)) \
        if edge_feat else None
    out = init_and_apply(
        gnn.TransformerConv(D, hidden, num_heads=H, feat_drop=0.0,
                            attn_drop=0.0, gate=gate),
        graph, graph.node_feat["h"], ef)
    assert out.shape == (N, H * hidden)


def test_gin(graph):
    out = init_and_apply(gnn.GINConv(D, 16, activation="relu",
                                     train_eps=True), graph,
                         graph.node_feat["h"])
    assert out.shape == (N, 16)


def test_rgcn():
    graphs = {
        "cites": Graph(EDGES[:20], num_nodes=N).tensor(),
        "links": Graph(EDGES[20:], num_nodes=N).tensor(),
    }
    layer = gnn.RGCNConv(D, 16, etypes=["cites", "links"], num_bases=2)
    out = init_and_apply(layer, graphs, jnp.asarray(FEAT))
    assert out.shape == (N, 16)


def test_sgc_and_cache(graph):
    layer = gnn.SGCConv(D, 5, k_hop=2, cached=True)
    variables = layer.init(jax.random.key(0), graph, graph.node_feat["h"])
    out, state = layer.apply(variables, graph, graph.node_feat["h"],
                             mutable=["cache"])
    assert out.shape == (N, 5)
    # cached propagation should match the uncached layer with same params
    layer2 = gnn.SGCConv(D, 5, k_hop=2, cached=False)
    out2 = layer2.apply({"params": variables["params"]}, graph,
                        graph.node_feat["h"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-5)


def test_ssgc(graph):
    out = init_and_apply(gnn.SSGCConv(D, 5, k_hop=4, cached=False),
                         graph, graph.node_feat["h"])
    assert out.shape == (N, 5)


def test_ngcf(graph):
    out = init_and_apply(gnn.NGCFConv(D, 16), graph, graph.node_feat["h"])
    assert out.shape == (N, 16)


def test_lightgcn_golden(graph):
    out = init_and_apply(gnn.LightGCNConv(), graph, graph.node_feat["h"])
    deg = np.maximum(np.asarray(graph.indegree()), 1).astype(np.float64)
    norm = (deg ** -0.5)[:, None]
    h = FEAT * norm
    agg = np.zeros_like(h)
    for s, d in EDGES:
        agg[d] += h[s]
    np.testing.assert_allclose(np.asarray(out), agg * norm, rtol=1e-4)


def test_faconv(graph):
    out = init_and_apply(gnn.FAConv(D, drop=0.0), graph,
                         graph.node_feat["h"])
    assert out.shape == (N, D)


def test_dropout_training_mode(graph):
    layer = gnn.GATConv(D, 6, num_heads=2, feat_drop=0.5, attn_drop=0.5)
    variables = layer.init(jax.random.key(0), graph, graph.node_feat["h"])
    out1 = layer.apply(variables, graph, graph.node_feat["h"], training=True,
                       rngs={"dropout": jax.random.key(1)})
    out2 = layer.apply(variables, graph, graph.node_feat["h"], training=True,
                       rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    # deterministic at eval
    out3 = layer.apply(variables, graph, graph.node_feat["h"])
    out4 = layer.apply(variables, graph, graph.node_feat["h"])
    np.testing.assert_allclose(np.asarray(out3), np.asarray(out4))


def test_edge_softmax_sums_to_one(graph):
    logits = jnp.asarray(rng.normal(size=(E,)).astype(np.float32))
    probs = GF.edge_softmax(graph, logits)
    sums = np.zeros(N)
    for eid, (s, d) in enumerate(EDGES):
        sums[d] += float(probs[eid])
    indeg = np.asarray(graph.indegree())
    np.testing.assert_allclose(sums[indeg > 0], 1.0, rtol=1e-5)


def test_degree_norm(graph):
    norm = GF.degree_norm(graph)
    deg = np.maximum(np.asarray(graph.indegree()), 1)
    np.testing.assert_allclose(np.asarray(norm)[:, 0], deg ** -0.5, rtol=1e-6)


def test_bernprop(graph):
    out = init_and_apply(gnn.BernProp(k_hop=4), graph, graph.node_feat["h"])
    assert out.shape == (N, D)
    assert np.all(np.isfinite(np.asarray(out)))
    # with all-one coefficients the Bernstein basis sums to identity-ish
    # filter; at least verify gradient flows to the coefficients
    layer = gnn.BernProp(k_hop=3)
    variables = layer.init(jax.random.key(0), graph, graph.node_feat["h"])
    g = jax.grad(lambda v: layer.apply(v, graph,
                                       graph.node_feat["h"]).sum())(variables)
    assert float(jnp.abs(g["params"]["temp"]).sum()) > 0


def test_chebprop(graph):
    out = init_and_apply(gnn.ChebProp(k_hop=5), graph, graph.node_feat["h"])
    assert out.shape == (N, D)
    assert np.all(np.isfinite(np.asarray(out)))


def test_lstm_aggregation(graph):
    from pgl_tpu.nn.aggregation import LSTMAggregation
    msgs = jnp.take(graph.node_feat["h"],
                    jnp.asarray(EDGES[:, 0]), axis=0)
    layer = LSTMAggregation(hidden_size=12, max_degree=8)
    variables = layer.init(jax.random.key(0), graph, msgs)
    out = layer.apply(variables, graph, msgs)
    assert out.shape == (N, 12)
    # nodes with no incoming edges output zeros
    indeg = np.asarray(graph.indegree())
    if (indeg == 0).any():
        np.testing.assert_allclose(np.asarray(out)[indeg == 0], 0.0)
    # jit + capped degree (max_degree < real max) still runs
    layer2 = LSTMAggregation(hidden_size=12, max_degree=2)
    v2 = layer2.init(jax.random.key(0), graph, msgs)
    out2 = jax.jit(lambda g, m: layer2.apply(v2, g, m))(graph, msgs)
    assert np.all(np.isfinite(np.asarray(out2)))


def test_segment_padding_cap_no_spill():
    from pgl_tpu import math as gmath
    data = jnp.arange(10, dtype=jnp.float32).reshape(5, 2)
    seg = jnp.asarray([0, 0, 0, 1, 1])
    padded, mask, _ = gmath.segment_padding(data, seg, num_segments=2,
                                            max_len=2)
    # segment 0 truncated to its first 2 rows; row 2 must NOT leak into seg 1
    np.testing.assert_allclose(np.asarray(padded[1, 0]), [6, 7])
    np.testing.assert_array_equal(np.asarray(mask), [[True, True],
                                                     [True, True]])
