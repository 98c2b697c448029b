"""HaloGraph (node-partitioned, boundary-only exchange) tests on the
virtual 8-device CPU mesh — parity with the single-device Graph plus the
north-star property: comm volume proportional to the partition cut
(BASELINE.md scaling recipe; reference contrast ``pgl/graph.py:1515``'s
full [N, d] allreduce)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from pgl_tpu import Graph
from pgl_tpu.parallel import HaloGraph, build_halo_partition


N, E, D = 37, 141, 5
rng = np.random.default_rng(7)
EDGES = rng.integers(0, N, (E, 2))
FEAT = rng.normal(size=(N, D)).astype(np.float32)


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()), ("node",))


@pytest.fixture(scope="module")
def graphs(mesh):
    g = Graph(EDGES, num_nodes=N, node_feat={"h": FEAT})
    hg = HaloGraph.from_graph(g, mesh)
    return g.tensor(), hg


def test_build_covers_every_edge_and_node(mesh):
    built = build_halo_partition(EDGES, N, 8)
    # every node owned exactly once
    owned = built["node_perm"][built["node_mask"] > 0]
    assert sorted(owned.tolist()) == list(range(N))
    # every edge appears exactly once across local+remote
    eids = np.concatenate([
        built["local_perm"][built["local_mask"] > 0],
        built["remote_perm"][built["remote_mask"] > 0]])
    assert sorted(eids.tolist()) == list(range(E))


def test_node_value_round_trip(graphs):
    _, hg = graphs
    x = hg.shard_node_values(FEAT)
    assert x.shape[0] == 8
    np.testing.assert_allclose(hg.unshard_node_values(x), FEAT)
    lab = rng.integers(0, 3, N)
    np.testing.assert_array_equal(
        hg.unshard_node_values(hg.shard_node_values(lab)), lab)


@pytest.mark.parametrize("op", ["sum", "mean", "max", "min"])
def test_halo_send_u_recv_matches(graphs, op):
    gt, hg = graphs
    ref = gt.send_recv(gt.node_feat["h"], op)
    out = hg.send_u_recv(hg.shard_node_values(FEAT), op)
    np.testing.assert_allclose(hg.unshard_node_values(out),
                               np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_halo_degree_matches(graphs):
    gt, hg = graphs
    np.testing.assert_array_equal(
        hg.unshard_node_values(hg.indegree()), np.asarray(gt.indegree()))
    np.testing.assert_array_equal(
        hg.unshard_node_values(hg.outdegree()), np.asarray(gt.outdegree()))


@pytest.mark.parametrize("message_op", ["add", "sub", "mul", "div"])
@pytest.mark.parametrize("reduce_op", ["sum", "mean", "max", "min"])
def test_halo_send_ue_recv_matches(graphs, message_op, reduce_op):
    """Full reference op matrix (pgl/graph.py:889-937) bit-parity vs the
    single-device Graph on the halo layout."""
    gt, hg = graphs
    # keep weights away from 0 so "div" is well-conditioned
    w = (rng.uniform(0.5, 1.5, (E,)) * np.sign(rng.normal(size=E))
         ).astype(np.float32)
    ref = gt.send_ue_recv(gt.node_feat["h"], jnp.asarray(w),
                          message_op, reduce_op)
    out = hg.send_ue_recv(hg.shard_node_values(FEAT),
                          hg.shard_edge_values(w), message_op, reduce_op)
    np.testing.assert_allclose(hg.unshard_node_values(out),
                               np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_halo_send_ue_recv_vector_edge_feat(graphs):
    """n-d edge values on the non-sum path (VERDICT round-2 weak #7)."""
    gt, hg = graphs
    w = rng.uniform(0.5, 1.5, (E, D)).astype(np.float32)
    for red in ("mean", "max"):
        ref = gt.send_ue_recv(gt.node_feat["h"], jnp.asarray(w), "mul", red)
        out = hg.send_ue_recv(hg.shard_node_values(FEAT),
                              hg.shard_edge_values(w), "mul", red)
        np.testing.assert_allclose(hg.unshard_node_values(out),
                                   np.asarray(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("message_op", ["add", "sub", "mul", "div"])
def test_halo_send_uv_ops(graphs, message_op):
    """SDDMM op coverage (pgl/graph.py:939-973) on the halo edge layout."""
    gt, hg = graphs
    a = rng.normal(size=(N, 3)).astype(np.float32)
    b = (rng.uniform(0.5, 1.5, (N, 3)) *
         np.sign(rng.normal(size=(N, 3)))).astype(np.float32)
    ref = np.asarray(gt.send_uv(jnp.asarray(a), jnp.asarray(b), message_op))
    out = hg.send_uv(hg.shard_node_values(a), hg.shard_node_values(b),
                     message_op)
    np.testing.assert_allclose(hg.unshard_edge_values(out), ref,
                               rtol=1e-4, atol=1e-5)


def test_halo_sddmm_and_softmax_match(graphs):
    gt, hg = graphs
    a = rng.normal(size=(N,)).astype(np.float32)
    ref = np.asarray(gt.send_uv(jnp.asarray(a), jnp.asarray(a), "add"))
    out = hg.send_uv(hg.shard_node_values(a), hg.shard_node_values(a),
                     "add")
    np.testing.assert_allclose(hg.unshard_edge_values(out), ref, rtol=1e-5)

    import pgl_tpu.nn.functional as GF
    ref_sm = np.asarray(GF.edge_softmax(gt, jnp.asarray(ref)))
    sm = hg.edge_softmax(hg.shard_edge_values(ref))
    np.testing.assert_allclose(hg.unshard_edge_values(sm), ref_sm,
                               rtol=1e-4, atol=1e-6)


def test_halo_bf16_wire_tolerance_parity(mesh):
    """halo_dtype=bfloat16 halves the wire bytes; results stay within bf16
    rounding of the f32-wire graph, gradients included, and
    comm_bytes_per_exchange reports the narrower wire."""
    g = Graph(EDGES, num_nodes=N, node_feat={"h": FEAT})
    hg32 = HaloGraph.from_graph(g, mesh)
    hgbf = HaloGraph.from_graph(g, mesh, halo_dtype="bfloat16")
    assert hgbf.comm_bytes_per_exchange * 2 == hg32.comm_bytes_per_exchange
    x32 = hg32.shard_node_values(FEAT)
    xbf = hgbf.shard_node_values(FEAT)

    o32 = hg32.unshard_node_values(hg32.send_u_recv(x32, "sum"))
    obf = hgbf.unshard_node_values(hgbf.send_u_recv(xbf, "sum"))
    # bf16 has ~3 decimal digits; per-row deviation bounded by rounding of
    # only the REMOTE contributions (local edges never touch the wire)
    np.testing.assert_allclose(np.asarray(obf), np.asarray(o32),
                               rtol=2e-2, atol=2e-2)
    assert float(np.abs(np.asarray(obf) - np.asarray(o32)).max()) > 0 \
        or hgbf.halo_size == 0   # the cast must actually be on the wire

    g32 = jax.grad(lambda x: (hg32.send_u_recv(x, "sum") ** 2).sum())(x32)
    gbf = jax.grad(lambda x: (hgbf.send_u_recv(x, "sum") ** 2).sum())(xbf)
    np.testing.assert_allclose(
        hgbf.unshard_node_values(gbf), hg32.unshard_node_values(g32),
        rtol=3e-2, atol=3e-2)

    # a GCN layer composes cleanly on the bf16-wire graph
    import pgl_tpu.nn as gnn
    layer = gnn.GCNConv(input_size=D, output_size=4)
    params = layer.init(jax.random.key(0), hgbf, xbf)
    out_bf = layer.apply(params, hgbf, xbf)
    out_32 = layer.apply(params, hg32, x32)
    np.testing.assert_allclose(np.asarray(out_bf), np.asarray(out_32),
                               rtol=2e-2, atol=2e-2)

    # scaling_report projects half the comm time under the bf16 wire
    rep32 = hg32.scaling_report(feat_dim=128)
    repbf = hgbf.scaling_report(feat_dim=128)
    np.testing.assert_allclose(np.asarray(repbf["t_comm_s"]) * 2,
                               np.asarray(rep32["t_comm_s"]), rtol=1e-6)


def test_halo_grad_matches(graphs):
    """Boundary-gradient exchange (the all_to_all transpose) must reproduce
    the single-device gradient exactly."""
    gt, hg = graphs

    def loss_single(x):
        return (gt.send_recv(x, "sum") ** 2).sum()

    def loss_halo(xs):
        return (hg.send_u_recv(xs, "sum") ** 2).sum()

    g1 = jax.grad(loss_single)(jnp.asarray(FEAT))
    g2 = jax.grad(loss_halo)(hg.shard_node_values(FEAT))
    np.testing.assert_allclose(hg.unshard_node_values(g2),
                               np.asarray(g1), rtol=1e-4, atol=1e-5)


def test_halo_comm_proportional_to_cut(mesh):
    """The north-star property: a well-partitioned graph exchanges only the
    cut-crossing boundary nodes, far below full replication."""
    # 8 dense communities with a sparse ring of bridges
    npc, S = 64, 8
    n = npc * S
    rng2 = np.random.default_rng(1)
    intra = []
    for c in range(S):
        u = rng2.integers(0, npc, (600, 2)) + c * npc
        intra.append(u)
    bridges = np.stack([
        rng2.integers(0, npc, 40) + ((np.arange(40) % S) * npc),
        rng2.integers(0, npc, 40) + (((np.arange(40) + 1) % S) * npc),
    ], axis=1)
    edges = np.concatenate(intra + [bridges])
    parts = np.arange(n) // npc
    built = build_halo_partition(edges, n, S, parts)
    cut_edges = int((parts[edges[:, 0]] != parts[edges[:, 1]]).sum())
    # unique boundary nodes never exceed the cut edge count...
    assert built["halo_size"] <= cut_edges
    # ...and are far below replication (v1 psum moved N rows per device)
    assert built["halo_size"] < n // 8
    g = Graph(edges, num_nodes=n).tensor()
    hg = HaloGraph.from_graph(Graph(edges, num_nodes=n), mesh, parts=parts)
    assert hg.halo_size == built["halo_size"]
    feat = rng2.normal(size=(n, 3)).astype(np.float32)
    out = hg.send_u_recv(hg.shard_node_values(feat), "sum")
    ref = g.send_recv(jnp.asarray(feat), "sum")
    np.testing.assert_allclose(hg.unshard_node_values(out),
                               np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_halo_metis_partition_smaller_halo(mesh):
    """metis partitioning must find (near-)community structure and beat a
    random assignment's halo size."""
    npc, S = 32, 8
    n = npc * S
    rng2 = np.random.default_rng(2)
    intra = [rng2.integers(0, npc, (300, 2)) + c * npc for c in range(S)]
    inter = rng2.integers(0, n, (60, 2))
    edges = np.concatenate(intra + [inter])
    g = Graph(edges, num_nodes=n)
    hg_metis = HaloGraph.from_graph(g, mesh, partition="metis")
    rand_parts = rng2.integers(0, S, n)
    hg_rand = HaloGraph.from_graph(g, mesh, parts=rand_parts)
    assert hg_metis.halo_size < hg_rand.halo_size / 2


def test_halo_under_jit(graphs):
    _, hg = graphs

    @jax.jit
    def f(hg, x):
        return hg.send_u_recv(x, "sum")

    x = hg.shard_node_values(FEAT)
    np.testing.assert_allclose(np.asarray(f(hg, x)),
                               np.asarray(f(hg, x)))


def test_halo_gcn_layer(graphs):
    """Existing conv layers run unmodified on the sharded layout."""
    import pgl_tpu.nn as gnn
    gt, hg = graphs
    layer = gnn.GCNConv(input_size=D, output_size=4)
    x = hg.shard_node_values(FEAT)
    params = layer.init(jax.random.key(0), hg, x)
    out = layer.apply(params, hg, x)
    ref = layer.apply(params, gt, gt.node_feat["h"])
    np.testing.assert_allclose(hg.unshard_node_values(out),
                               np.asarray(ref), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# fused multi-chip GAT attention
# ---------------------------------------------------------------------------

def _gat_layer_and_params(graphs):
    from pgl_tpu.nn import GATConv
    gt, hg = graphs
    layer = GATConv(input_size=D, hidden_size=6, num_heads=4,
                    feat_drop=0.0, attn_drop=0.0)
    x = hg.shard_node_values(FEAT)
    params = layer.init(jax.random.key(0), hg, x)
    return layer, params, x, gt, hg


def test_halo_gat_conv_parity(graphs):
    """GATConv on a HaloGraph (per-shard attention + halo exchange)
    matches the single-device layer, forward and gradients."""
    layer, params, x, gt, hg = _gat_layer_and_params(graphs)
    out_h = hg.unshard_node_values(layer.apply(params, hg, x))
    out_1 = layer.apply(params, gt, gt.node_feat["h"])
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(out_1),
                               rtol=1e-4, atol=1e-5)

    g_h = jax.grad(lambda p: (layer.apply(p, hg, x) ** 2).sum())(params)
    g_1 = jax.grad(
        lambda p: (layer.apply(p, gt, gt.node_feat["h"]) ** 2).sum())(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_h),
                    jax.tree_util.tree_leaves(g_1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_halo_gat_fused_kernel_branch(graphs, monkeypatch):
    """The Pallas (interpret) per-shard kernel branch agrees with the XLA
    per-shard composition."""
    layer, params, x, gt, hg = _gat_layer_and_params(graphs)
    out_xla = layer.apply(params, hg, x)
    monkeypatch.setenv("PGL_TPU_FUSED_ATTN", "1")
    out_pl = layer.apply(params, hg, x)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla),
                               rtol=1e-4, atol=1e-5)


def test_halo_gat_attention_dropout_deterministic(graphs):
    """Same drop seed → identical output; different seeds differ; rate
    keeps the expectation roughly unbiased."""
    gt, hg = graphs
    rng2 = np.random.default_rng(11)
    H, DVH = 4, 8
    a_dst = hg.shard_node_values(
        rng2.normal(size=(N, H)).astype(np.float32))
    a_src = hg.shard_node_values(
        rng2.normal(size=(N, H)).astype(np.float32))
    v = hg.shard_node_values(
        rng2.normal(size=(N, H * DVH)).astype(np.float32))
    o1 = hg.gat_attention(a_dst, a_src, v, 0.2, 0.5, jnp.int32(3))
    o2 = hg.gat_attention(a_dst, a_src, v, 0.2, 0.5, jnp.int32(3))
    o3 = hg.gat_attention(a_dst, a_src, v, 0.2, 0.5, jnp.int32(4))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert float(jnp.max(jnp.abs(o1 - o3))) > 0
    o0 = hg.gat_attention(a_dst, a_src, v, 0.2, 0.0)
    # dropout is unbiased in expectation — a loose sanity band
    mean = np.asarray(jnp.stack(
        [hg.gat_attention(a_dst, a_src, v, 0.2, 0.5, jnp.int32(s))
         for s in range(8)])).mean(axis=0)
    denom = np.abs(np.asarray(o0)).mean() + 1e-6
    assert np.abs(mean - np.asarray(o0)).mean() / denom < 0.5


# ---------------------------------------------------------------------------
# fused multi-chip dot-score (TransformerConv) attention
# ---------------------------------------------------------------------------

def test_halo_transformer_conv_parity(graphs):
    """TransformerConv on a HaloGraph (per-shard dot attention + halo
    exchange) matches the single-device layer, forward and gradients."""
    from pgl_tpu.nn import TransformerConv
    gt, hg = graphs
    layer = TransformerConv(input_size=D, hidden_size=8, num_heads=4,
                            feat_drop=0.0, attn_drop=0.0)
    x = hg.shard_node_values(FEAT)
    params = layer.init(jax.random.key(0), hg, x)
    out_h = hg.unshard_node_values(layer.apply(params, hg, x))
    out_1 = layer.apply(params, gt, gt.node_feat["h"])
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(out_1),
                               rtol=1e-4, atol=1e-5)

    g_h = jax.grad(lambda p: (layer.apply(p, hg, x) ** 2).sum())(params)
    g_1 = jax.grad(
        lambda p: (layer.apply(p, gt, gt.node_feat["h"]) ** 2).sum())(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_h),
                    jax.tree_util.tree_leaves(g_1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_halo_dot_attention_fused_kernel_branch(graphs, monkeypatch):
    """The Pallas (interpret) dot-score branch agrees with the XLA
    per-shard composition, including DS = H*dsh = 128 lane alignment."""
    gt, hg = graphs
    rng2 = np.random.default_rng(23)
    H, dsh, dvh = 4, 32, 32
    q = hg.shard_node_values(
        rng2.normal(size=(N, H * dsh)).astype(np.float32))
    k = hg.shard_node_values(
        rng2.normal(size=(N, H * dsh)).astype(np.float32))
    v = hg.shard_node_values(
        rng2.normal(size=(N, H * dvh)).astype(np.float32))
    out_xla = hg.dot_attention(q, k, v, H)
    monkeypatch.setenv("PGL_TPU_FUSED_ATTN", "1")
    out_pl = hg.dot_attention(q, k, v, H)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla),
                               rtol=1e-4, atol=1e-5)

    def loss(fn_in):
        q, k, v = fn_in
        return (hg.dot_attention(q, k, v, H) ** 2).sum()

    g_pl = jax.grad(loss)((q, k, v))
    monkeypatch.delenv("PGL_TPU_FUSED_ATTN")
    g_xla = jax.grad(loss)((q, k, v))
    for a, b in zip(g_pl, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_halo_transformer_conv_mean_heads(graphs):
    """concat=False head-mean works on the sharded [S, N_pad, H, D]
    layout."""
    from pgl_tpu.nn import TransformerConv
    gt, hg = graphs
    layer = TransformerConv(input_size=D, hidden_size=8, num_heads=4,
                            feat_drop=0.0, attn_drop=0.0, concat=False)
    x = hg.shard_node_values(FEAT)
    params = layer.init(jax.random.key(0), hg, x)
    out_h = hg.unshard_node_values(layer.apply(params, hg, x))
    out_1 = layer.apply(params, gt, gt.node_feat["h"])
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(out_1),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# full conv-layer zoo on the halo layout
# ---------------------------------------------------------------------------

def _zoo(D):
    # the layers exercising DISTINCT grap-op compositions; the pure
    # send_recv-loop layers (APPNP/GPR/GCNII/SSGC/Bern/Cheb) share the
    # code path already covered by test_halo_send_u_recv + "gcn"/"sgc"
    import pgl_tpu.nn as gnn
    return {
        "graphsage": gnn.GraphSageConv(input_size=D, hidden_size=6),
        "gcn": gnn.GCNConv(input_size=D, output_size=6),
        "gatv2": gnn.GATv2Conv(input_size=D, hidden_size=6, num_heads=2,
                               feat_drop=0.0, attn_drop=0.0),
        "gin": gnn.GINConv(input_size=D, output_size=6),
        "sgc": gnn.SGCConv(input_size=D, output_size=6, k_hop=2,
                           cached=False),
        "ngcf": gnn.NGCFConv(input_size=D, output_size=6),
        "lightgcn": gnn.LightGCNConv(),
        "faconv": gnn.FAConv(hidden_size=D, drop=0.0),
    }


@pytest.mark.parametrize("name", sorted(_zoo(D)))
def test_halo_layer_zoo_parity(graphs, name):
    """Every conv layer runs unmodified on the [S, N_pad, D] halo layout
    and matches the single-device Graph bit-for-bit (the layers compose
    only send_recv / send_ue_recv / send_uv / edge_softmax / degree_norm,
    all of which HaloGraph provides shard-local + halo exchange)."""
    layer = _zoo(D)[name]
    gt, hg = graphs
    x = hg.shard_node_values(FEAT)
    params = layer.init(jax.random.key(0), hg, x)
    out_h = hg.unshard_node_values(layer.apply(params, hg, x))
    ref = layer.apply(params, gt, gt.node_feat["h"])
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_halo_pinsage_edge_weights(graphs):
    """PinSage's per-edge weights ride the sharded edge layout
    (shard_edge_values → send_ue_recv)."""
    import pgl_tpu.nn as gnn
    gt, hg = graphs
    rng2 = np.random.default_rng(3)
    ew = rng2.uniform(0.5, 1.5, (E, 1)).astype(np.float32)
    layer = gnn.PinSageConv(input_size=D, hidden_size=6)
    x = hg.shard_node_values(FEAT)
    ew_h = hg.shard_edge_values(ew)
    params = layer.init(jax.random.key(0), hg, x, ew_h)
    out_h = hg.unshard_node_values(layer.apply(params, hg, x, ew_h))
    ref = layer.apply(params, gt, gt.node_feat["h"], jnp.asarray(ew))
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_halo_transformer_conv_edge_feat(graphs):
    """TransformerConv with per-edge features on a HaloGraph (edge-space
    composition + recv_edge_values) matches the single-device layer."""
    from pgl_tpu.nn import TransformerConv
    gt, hg = graphs
    H, Dh = 2, 4
    layer = TransformerConv(input_size=D, hidden_size=Dh, num_heads=H,
                            feat_drop=0.0, attn_drop=0.0)
    rng2 = np.random.default_rng(9)
    ef = rng2.normal(size=(E, H * Dh)).astype(np.float32)
    x = hg.shard_node_values(FEAT)
    ef_h = hg.shard_edge_values(ef)
    params = layer.init(jax.random.key(0), hg, x, ef_h)
    out_h = hg.unshard_node_values(layer.apply(params, hg, x, ef_h))
    out_1 = layer.apply(params, gt, gt.node_feat["h"], jnp.asarray(ef))
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(out_1),
                               rtol=1e-4, atol=1e-5)

    g_h = jax.grad(
        lambda p: (layer.apply(p, hg, x, ef_h) ** 2).sum())(params)
    g_1 = jax.grad(lambda p: (layer.apply(
        p, gt, gt.node_feat["h"], jnp.asarray(ef)) ** 2).sum())(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_h),
                    jax.tree_util.tree_leaves(g_1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_scaling_report(mesh):
    """scaling_report: exact per-shard edge/halo accounting + a sane
    efficiency projection (clustered graph → comm hidden, eff ≈ 1/skew)."""
    npc, S = 64, 8
    n = npc * S
    rng2 = np.random.default_rng(4)
    intra = [rng2.integers(0, npc, (500, 2)) + c * npc for c in range(S)]
    bridges = rng2.integers(0, n, (50, 2))
    edges = np.concatenate(intra + [bridges])
    parts = np.arange(n) // npc
    hg = HaloGraph.from_graph(Graph(edges, num_nodes=n), mesh, parts=parts)
    rep = hg.scaling_report(feat_dim=128)
    assert sum(rep["edges_per_shard"]) == len(edges)
    assert sum(rep["halo_rows_recv"]) == hg.halo_size
    # clustered + balanced: comm far below compute, efficiency high
    assert all(c < t for c, t in zip(rep["t_comm_s"], rep["t_compute_s"]))
    assert 0.8 < rep["scaling_efficiency"] <= 1.0
    assert rep["edge_skew"] >= 1.0


def test_halo_degenerate_partitions(mesh):
    """Tiny graphs (fewer meaningful nodes than shards) and zero-cut
    partitions must still produce exact results."""
    from pgl_tpu.nn import GATConv
    rng2 = np.random.default_rng(6)
    # N=11 over 8 shards: several shards own 1 node, one owns 4
    edges = rng2.integers(0, 11, (23, 2))
    feat = rng2.normal(size=(11, D)).astype(np.float32)
    g = Graph(edges, num_nodes=11, node_feat={"h": feat})
    hg = HaloGraph.from_graph(g, mesh)
    gt = g.tensor()
    out = hg.send_u_recv(hg.shard_node_values(feat), "sum")
    np.testing.assert_allclose(
        hg.unshard_node_values(out),
        np.asarray(gt.send_recv(gt.node_feat["h"], "sum")),
        rtol=1e-5, atol=1e-6)

    layer = GATConv(input_size=D, hidden_size=3, num_heads=2,
                    feat_drop=0.0, attn_drop=0.0)
    x = hg.shard_node_values(feat)
    params = layer.init(jax.random.key(0), hg, x)
    np.testing.assert_allclose(
        np.asarray(hg.unshard_node_values(layer.apply(params, hg, x))),
        np.asarray(layer.apply(params, gt, gt.node_feat["h"])),
        rtol=1e-4, atol=1e-5)

    # zero-cut partition: all edges intra-shard, halo must be 0 and the
    # attention path still exact
    npc = 8
    n = npc * 8
    intra = np.concatenate(
        [rng2.integers(0, npc, (40, 2)) + c * npc for c in range(8)])
    feat2 = rng2.normal(size=(n, D)).astype(np.float32)
    g2 = Graph(intra, num_nodes=n, node_feat={"h": feat2})
    hg2 = HaloGraph.from_graph(g2, Mesh(np.array(jax.devices()),
                                        ("node",)),
                               parts=np.arange(n) // npc)
    assert hg2.halo_size == 0
    gt2 = g2.tensor()
    x2 = hg2.shard_node_values(feat2)
    params2 = layer.init(jax.random.key(1), hg2, x2)
    np.testing.assert_allclose(
        np.asarray(hg2.unshard_node_values(
            layer.apply(params2, hg2, x2))),
        np.asarray(layer.apply(params2, gt2, gt2.node_feat["h"])),
        rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("op", ["sum", "mean", "max"])
def test_halo_udf_send_recv(graphs, op):
    """The UDF send/recv contract (reference DistGPUGraph overrides
    pgl/graph.py:1509) runs on the halo layout: per-edge message_func
    over gathered src/dst dicts, string reduce, zeros for isolated
    nodes."""
    gt, hg = graphs
    rng2 = np.random.default_rng(8)
    w = rng2.normal(size=(N, 3)).astype(np.float32)

    def message(src, dst, edge):
        return {"m": src["h"] * 0.5 + dst["w"].sum(-1, keepdims=True)}

    ref_msg = gt.send(message, src_feat={"h": gt.node_feat["h"]},
                      dst_feat={"w": jnp.asarray(w)})
    ref = gt.recv(op, ref_msg)

    x = hg.shard_node_values(FEAT)
    wh = hg.shard_node_values(w)
    msg = hg.send(message, src_feat={"h": x}, dst_feat={"w": wh})
    out = hg.recv(op, msg)
    np.testing.assert_allclose(np.asarray(hg.unshard_node_values(out)),
                               np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_halo_save_load_round_trip(graphs, tmp_path):
    """Persisted partitions skip METIS + halo construction at boot: every
    aggregation and attention result matches the freshly built graph."""
    gt, hg = graphs
    path = str(tmp_path / "halo.npz")
    hg.save(path)
    mesh2 = Mesh(np.array(jax.devices()), ("node",))
    hg2 = HaloGraph.load(path, mesh2)
    assert hg2.num_nodes == hg.num_nodes
    assert hg2.num_edges == hg.num_edges
    assert hg2.halo_size == hg.halo_size
    x = hg2.node_feat["h"]
    np.testing.assert_allclose(
        np.asarray(hg2.unshard_node_values(hg2.send_u_recv(x, "sum"))),
        np.asarray(gt.send_recv(gt.node_feat["h"], "sum")),
        rtol=1e-5, atol=1e-6)
    rng2 = np.random.default_rng(12)
    a = hg2.shard_node_values(rng2.normal(size=(N, 2)).astype(np.float32))
    v = hg2.shard_node_values(
        rng2.normal(size=(N, 8)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(hg2.gat_attention(a, a, v)),
        np.asarray(hg.gat_attention(a, a, v)), rtol=1e-5, atol=1e-6)
