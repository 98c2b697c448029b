"""Hand-computed golden values for the *parameterized* conv layers.

Every test injects explicit weights and recomputes the layer's output in
plain numpy following the REFERENCE equations (cited per test from
``/root/reference/pgl/nn/conv.py``), so layer semantics are pinned by
numbers, not by code inspection. Graph: 3 nodes, edges (0→2), (1→2),
(1→0); node 1 has no in-edges (must produce zeros from the aggregation).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pgl_tpu import Graph
import pgl_tpu.nn as gnn


EDGES = np.array([[0, 2], [1, 2], [1, 0]])
SRC, DST = EDGES[:, 0], EDGES[:, 1]
N = 3
X = np.array([[1.0, 2.0],
              [-1.0, 0.5],
              [0.5, -1.5]], np.float32)
DEG_IN = np.array([1, 0, 2])          # in-degree per node
NORM = np.maximum(DEG_IN, 1) ** -0.5  # degree_norm column


@pytest.fixture(scope="module")
def graph():
    return Graph(EDGES, num_nodes=N, node_feat={"h": X}).tensor()


def seg_sum(vals, ids, n=N):
    out = np.zeros((n,) + vals.shape[1:], np.float64)
    for v, i in zip(vals, ids):
        out[i] += v
    return out


def dst_softmax(scores):
    """Per-edge scores → softmax over each dst's incoming edges."""
    out = np.zeros_like(scores, dtype=np.float64)
    for d in set(DST.tolist()):
        sel = DST == d
        e = np.exp(scores[sel] - scores[sel].max(axis=0))
        out[sel] = e / e.sum(axis=0)
    return out


def l2n(x):
    return x / np.sqrt(np.maximum((x * x).sum(axis=1, keepdims=True),
                                  1e-12))


W_A = np.array([[0.3, -0.2], [0.1, 0.4]], np.float32)
W_B = np.array([[-0.5, 0.2], [0.3, 0.1]], np.float32)
B_A = np.array([0.05, -0.1], np.float32)
B_B = np.array([-0.2, 0.3], np.float32)


def run(layer, params, graph, *args, **kwargs):
    return np.asarray(layer.apply({"params": params}, graph, *args,
                                  **kwargs))


def test_gat_golden(graph):
    """Reference pgl/nn/conv.py:257-346: score = leaky(a_src·h_s +
    a_dst·h_d), softmax over dst in-edges, weighted sum of h_s."""
    w_src = np.array([[0.7, -0.3]], np.float32)
    w_dst = np.array([[0.2, 0.5]], np.float32)
    layer = gnn.GATConv(2, 2, feat_drop=0.0, attn_drop=0.0, num_heads=1)
    params = {"linear": {"kernel": W_A, "bias": B_A},
              "weight_src": w_src, "weight_dst": w_dst}
    out = run(layer, params, graph, graph.node_feat["h"])

    h = X @ W_A + B_A
    a_s = (h * w_src[0]).sum(1)
    a_d = (h * w_dst[0]).sum(1)
    sc = a_s[SRC] + a_d[DST]
    sc = np.where(sc >= 0, sc, 0.2 * sc)
    alpha = dst_softmax(sc)
    exp = seg_sum(h[SRC] * alpha[:, None], DST)
    np.testing.assert_allclose(out, exp, rtol=1e-5, atol=1e-6)
    assert np.allclose(out[1], 0.0)   # no in-edges → zeros


def test_gatv2_golden(graph):
    """Reference pgl/nn/conv.py:349-436: alpha = a·leaky(h_s + h_d)."""
    attn = np.array([[[0.4, -0.6]]], np.float32)
    layer = gnn.GATv2Conv(2, 2, feat_drop=0.0, attn_drop=0.0, num_heads=1)
    params = {"linear": {"kernel": W_A, "bias": B_A}, "attn": attn}
    out = run(layer, params, graph, graph.node_feat["h"])

    h = X @ W_A + B_A
    pre = h[SRC] + h[DST]
    pre = np.where(pre >= 0, pre, 0.2 * pre)
    sc = (pre * attn[0, 0]).sum(1)
    alpha = dst_softmax(sc)
    exp = seg_sum(h[SRC] * alpha[:, None], DST)
    np.testing.assert_allclose(out, exp, rtol=1e-5, atol=1e-6)


def test_graphsage_golden(graph):
    """Reference pgl/nn/conv.py:46-115: self·W1 + aggr(neigh)·W2, L2."""
    layer = gnn.GraphSageConv(2, 2, aggr_func="sum", normalize=True)
    params = {"self_linear": {"kernel": W_A, "bias": B_A},
              "neigh_linear": {"kernel": W_B, "bias": B_B}}
    out = run(layer, params, graph, graph.node_feat["h"])

    neigh = seg_sum(X[SRC], DST)
    exp = l2n((X @ W_A + B_A) + (neigh @ W_B + B_B))
    np.testing.assert_allclose(out, exp, rtol=1e-5, atol=1e-6)


def test_pinsage_golden(graph):
    """Reference pgl/nn/conv.py:118-187: edge-weighted neighbor sum."""
    ew = np.array([2.0, 0.5, -1.0], np.float32)
    layer = gnn.PinSageConv(2, 2, aggr_func="sum")
    params = {"self_linear": {"kernel": W_A, "bias": B_A},
              "neigh_linear": {"kernel": W_B, "bias": B_B}}
    out = run(layer, params, graph, graph.node_feat["h"],
              jnp.asarray(ew.reshape(-1, 1)))

    neigh = seg_sum(X[SRC] * ew[:, None], DST)
    exp = l2n((X @ W_A + B_A) + (neigh @ W_B + B_B))
    np.testing.assert_allclose(out, exp, rtol=1e-5, atol=1e-6)


def test_gin_golden(graph):
    """Reference pgl/nn/conv.py:888-958: ((1+eps)x + Σ_in x_s) → Dense →
    LayerNorm → Dense."""
    layer = gnn.GINConv(2, 2, init_eps=0.3, train_eps=False)
    params = {"linear1": {"kernel": W_A, "bias": B_A},
              "linear2": {"kernel": W_B, "bias": B_B},
              "layer_norm": {"scale": np.array([1.5, 0.5], np.float32),
                             "bias": np.array([0.1, -0.1], np.float32)}}
    out = run(layer, params, graph, graph.node_feat["h"])

    h = seg_sum(X[SRC], DST) + 1.3 * X
    h = h @ W_A + B_A
    mu = h.mean(1, keepdims=True)
    var = h.var(1, keepdims=True)
    h = (h - mu) / np.sqrt(var + 1e-6)
    h = h * np.array([1.5, 0.5]) + np.array([0.1, -0.1])
    exp = h @ W_B + B_B
    np.testing.assert_allclose(out, exp, rtol=1e-4, atol=1e-5)


def test_gcnii_golden(graph):
    """Reference pgl/nn/conv.py:645-722: per hop, beta_i = log(λ/(i+1)+1);
    f ← Âf; f ← αh0+(1-α)f; f ← beta·Dense_i(f)+(1-beta)·f."""
    layer = gnn.GCNII(hidden_size=2, lambda_l=0.5, alpha=0.2, k_hop=2,
                      dropout=0.0)
    params = {"mlp_0": {"kernel": W_A, "bias": B_A},
              "mlp_1": {"kernel": W_B, "bias": B_B}}
    out = run(layer, params, graph, graph.node_feat["h"])

    f = X.astype(np.float64)
    h0 = f.copy()
    Ws = [(W_A, B_A), (W_B, B_B)]
    for i in range(2):
        beta = np.log(0.5 / (i + 1) + 1)
        f = seg_sum((f * NORM[:, None])[SRC], DST) * NORM[:, None]
        f = 0.2 * h0 + 0.8 * f
        W, b = Ws[i]
        f = beta * (f @ W + b) + (1 - beta) * f
    np.testing.assert_allclose(out, f, rtol=1e-5, atol=1e-6)


def test_transformer_conv_golden(graph):
    """Reference pgl/nn/conv.py:724-886: per-edge q·k attention (q scaled
    by 1/√d), softmax by dst, Σ α·v, plus skip and LayerNorm."""
    Wq = np.array([[0.5, 0.1], [-0.2, 0.3]], np.float32)
    Wk = np.array([[0.2, -0.4], [0.6, 0.2]], np.float32)
    Wv = W_A
    Wsk = W_B
    bq = np.array([0.0, 0.1], np.float32)
    bk = np.array([-0.1, 0.0], np.float32)
    bv = B_A
    bsk = B_B
    layer = gnn.TransformerConv(2, 2, num_heads=1, feat_drop=0.0,
                                attn_drop=0.0, skip_feat=True, gate=False,
                                layer_norm=True, activation=None)
    params = {"q": {"kernel": Wq, "bias": bq},
              "k": {"kernel": Wk, "bias": bk},
              "v": {"kernel": Wv, "bias": bv},
              "skip_feat": {"kernel": Wsk, "bias": bsk},
              "ln": {"scale": np.ones(2, np.float32),
                     "bias": np.zeros(2, np.float32)}}
    out = run(layer, params, graph, graph.node_feat["h"])

    q = (X @ Wq + bq) / np.sqrt(2.0)
    k = X @ Wk + bk
    v = X @ Wv + bv
    sc = (q[DST] * k[SRC]).sum(1)
    alpha = dst_softmax(sc)
    agg = seg_sum(v[SRC] * alpha[:, None], DST)
    o = (X @ Wsk + bsk) + agg
    mu, var = o.mean(1, keepdims=True), o.var(1, keepdims=True)
    exp = (o - mu) / np.sqrt(var + 1e-6)
    np.testing.assert_allclose(out, exp, rtol=1e-4, atol=1e-5)


def test_gpr_golden(graph):
    """Reference pgl/nn/conv.py:500-643: MLP then hidden = Σ_k temp_k Â^k."""
    temp = np.array([0.5, 0.3, 0.2], np.float32)
    layer = gnn.GPRConv(2, 2, 2, drop=0.0, dprate=0.0, k_hop=2,
                        init_method="WS", gamma=(0.0, 0.0, 0.0))
    params = {"linear_1": {"kernel": W_A, "bias": B_A},
              "linear_2": {"kernel": W_B, "bias": B_B},
              "temp": temp}
    out = run(layer, params, graph, graph.node_feat["h"])

    f = np.maximum(X @ W_A + B_A, 0.0) @ W_B + B_B
    hid = temp[0] * f
    for kk in range(2):
        f = seg_sum((f * NORM[:, None])[SRC], DST) * NORM[:, None]
        hid = hid + temp[kk + 1] * f
    np.testing.assert_allclose(out, hid, rtol=1e-5, atol=1e-6)


def test_ngcf_golden(graph):
    """Reference pgl/nn/conv.py:1202-1250: leaky(W1·((Σ+x)·norm) +
    W2·(x⊙((Σ+x)·norm)))."""
    layer = gnn.NGCFConv(2, 2)
    params = {"linear": {"kernel": W_A, "bias": B_A},
              "linear2": {"kernel": W_B, "bias": B_B}}
    out = run(layer, params, graph, graph.node_feat["h"])

    o0 = (seg_sum(X[SRC], DST) + X) * NORM[:, None]
    o = (o0 @ W_A + B_A) + ((X * o0) @ W_B + B_B)
    exp = np.where(o >= 0, o, 0.2 * o)
    np.testing.assert_allclose(out, exp, rtol=1e-5, atol=1e-6)


def test_faconv_golden(graph):
    """Reference pgl/nn/conv.py:1287-1341: α = tanh(g·[h_s|h_d]) ·
    norm_s · norm_d; out[d] = Σ α h_s."""
    Wg = np.array([[0.4], [-0.3], [0.2], [0.5]], np.float32)
    bg = np.array([0.1], np.float32)
    layer = gnn.FAConv(hidden_size=2, drop=0.0)
    params = {"gate": {"kernel": Wg, "bias": bg}}
    out = run(layer, params, graph, graph.node_feat["h"])

    gin = np.concatenate([X[SRC], X[DST]], axis=1)
    alpha = np.tanh(gin @ Wg + bg)[:, 0] * NORM[SRC] * NORM[DST]
    exp = seg_sum(X[SRC] * alpha[:, None], DST)
    np.testing.assert_allclose(out, exp, rtol=1e-5, atol=1e-6)


def test_ssgc_golden(graph):
    """Reference pgl/nn/conv.py:1104-1199: mean of damped hops + α·x0,
    then linear."""
    layer = gnn.SSGCConv(2, 2, k_hop=2, alpha=0.1, cached=False)
    params = {"linear": {"kernel": W_A}}
    out = run(layer, params, graph, graph.node_feat["h"])

    f = X.astype(np.float64)
    acc = f.copy()
    for _ in range(2):
        f = seg_sum((f * NORM[:, None])[SRC], DST) * NORM[:, None]
        f = 0.9 * f
        acc = acc + f
    exp = (acc / 2 + 0.1 * X) @ W_A
    np.testing.assert_allclose(out, exp, rtol=1e-5, atol=1e-6)


def test_rgcn_golden():
    """Reference pgl/nn/conv.py:961-1025: Σ_r mean-aggr(x·W_r), basis
    decomposition W_r = Σ_b comp[r,b]·V_b."""
    g1 = Graph(np.array([[0, 2], [1, 2]]), num_nodes=N).tensor()
    g2 = Graph(np.array([[2, 0], [2, 1], [0, 1]]), num_nodes=N).tensor()
    weight = np.stack([W_A, W_B]).astype(np.float32)     # [bases=2, 2, 2]
    layer = gnn.RGCNConv(2, 2, etypes=["a", "b"], num_bases=0)
    out = np.asarray(layer.apply({"params": {"weight": weight}},
                                 {"a": g1, "b": g2}, jnp.asarray(X)))

    def mean_aggr(g_edges, h):
        s, d = g_edges[:, 0], g_edges[:, 1]
        acc = seg_sum(h[s], d)
        cnt = np.maximum(np.bincount(d, minlength=N), 1)
        return acc / cnt[:, None]

    exp = (mean_aggr(np.array([[0, 2], [1, 2]]), X @ W_A)
           + mean_aggr(np.array([[2, 0], [2, 1], [0, 1]]), X @ W_B))
    np.testing.assert_allclose(out, exp, rtol=1e-5, atol=1e-6)
