"""HeterGraph + BiGraph tests (mirroring reference ``tests/test_hetergraph.py``
and ``tests/test_bigraph.py`` coverage on tiny golden graphs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pgl_tpu import Graph
from pgl_tpu.heter_graph import HeterGraph
from pgl_tpu.bigraph import BiGraph


def make_heter():
    edges = {
        "click": np.array([[0, 1], [1, 2], [2, 0]]),
        "buy": np.array([[0, 2], [2, 1]]),
    }
    node_types = [(0, "user"), (1, "item"), (2, "item")]
    return HeterGraph(edges, num_nodes=3, node_types=node_types,
                      node_feat={"h": np.arange(6, dtype=np.float32)
                                 .reshape(3, 2)})


def test_heter_structure():
    hg = make_heter()
    assert sorted(hg.edge_types) == ["buy", "click"]
    assert hg.num_nodes == 3
    assert hg.num_edges == 5
    assert hg.num_nodes_by_type("item") == 2
    np.testing.assert_array_equal(hg.nodes_by_type("user"), [0])


def test_heter_getitem_and_degree():
    hg = make_heter()
    assert isinstance(hg["click"], Graph)
    np.testing.assert_array_equal(hg["click"].indegree(), [1, 1, 1])
    np.testing.assert_array_equal(hg.indegree(edge_type="buy"), [0, 1, 1])
    np.testing.assert_array_equal(hg.indegree(), [1, 2, 2])  # summed


def test_heter_message_passing():
    hg = make_heter().tensor()
    h = hg["click"].node_feat["h"]
    out = hg["click"].send_recv(h, "sum")
    exp = np.zeros((3, 2), np.float32)
    feat = np.arange(6, dtype=np.float32).reshape(3, 2)
    for s, d in [(0, 1), (1, 2), (2, 0)]:
        exp[d] += feat[s]
    np.testing.assert_allclose(np.asarray(out), exp)


def test_heter_node_batch_iter():
    hg = make_heter()
    batches = list(hg.node_batch_iter(2, shuffle=False, n_type="item"))
    np.testing.assert_array_equal(np.concatenate(batches), [1, 2])


def test_heter_dump_load(tmp_path):
    hg = make_heter()
    path = str(tmp_path / "hg")
    hg.dump(path)
    hg2 = HeterGraph.load(path)
    assert sorted(hg2.edge_types) == ["buy", "click"]
    assert hg2.num_nodes == 3
    np.testing.assert_array_equal(np.asarray(hg2["buy"].edges),
                                  [[0, 2], [2, 1]])


def make_bigraph():
    # 3 users -> 4 items
    edges = np.array([[0, 1], [0, 3], [1, 0], [2, 2], [2, 3]])
    return BiGraph(
        edges, src_num_nodes=3, dst_num_nodes=4,
        src_node_feat={"h": np.arange(6, dtype=np.float32).reshape(3, 2)},
        dst_node_feat={"h": np.arange(8, dtype=np.float32).reshape(4, 2)},
        edge_feat={"w": np.arange(5, dtype=np.float32)})


def test_bigraph_structure():
    bg = make_bigraph()
    assert bg.src_num_nodes == 3 and bg.dst_num_nodes == 4
    np.testing.assert_array_equal(bg.outdegree(), [2, 1, 2])
    np.testing.assert_array_equal(bg.indegree(), [1, 1, 1, 2])
    succ = bg.successor()
    assert sorted(succ[0].tolist()) == [1, 3]
    pred = bg.predecessor()
    assert sorted(pred[3].tolist()) == [0, 2]


def test_bigraph_send_recv():
    bg = make_bigraph().tensor()
    feat = np.arange(6, dtype=np.float32).reshape(3, 2)
    out = bg.send_recv(jnp.asarray(feat), "sum")
    exp = np.zeros((4, 2), np.float32)
    for s, d in [(0, 1), (0, 3), (1, 0), (2, 2), (2, 3)]:
        exp[d] += feat[s]
    np.testing.assert_allclose(np.asarray(out), exp)
    out = bg.send_recv(jnp.asarray(feat), "max")
    assert out.shape == (4, 2)


def test_bigraph_udf():
    bg = make_bigraph().tensor()
    msg = bg.send(lambda s, d, e: {"m": s["h"] * e["w"][:, None]},
                  src_feat={"h": bg.src_node_feat["h"]},
                  edge_feat={"w": bg.edge_feat["w"]})
    out = bg.recv(lambda m: m.reduce_sum(m["m"]), msg)
    feat = np.arange(6, dtype=np.float32).reshape(3, 2)
    w = np.arange(5, dtype=np.float32)
    exp = np.zeros((4, 2), np.float32)
    for eid, (s, d) in enumerate([(0, 1), (0, 3), (1, 0), (2, 2), (2, 3)]):
        exp[d] += feat[s] * w[eid]
    np.testing.assert_allclose(np.asarray(out), exp)


def test_bigraph_disjoint():
    b1 = make_bigraph()
    b2 = make_bigraph()
    b = BiGraph.disjoint([b1, b2])
    assert b.src_num_nodes == 6 and b.dst_num_nodes == 8
    assert b.num_edges == 10 and b.num_graph == 2
    np.testing.assert_array_equal(np.asarray(b.edges)[5], [3, 5])
    np.testing.assert_array_equal(b.graph_src_node_id, [0] * 3 + [1] * 3)
    np.testing.assert_array_equal(b.graph_dst_node_id, [0] * 4 + [1] * 4)


def test_bigraph_dump_load(tmp_path):
    bg = make_bigraph()
    path = str(tmp_path / "bg")
    bg.dump(path)
    bg2 = BiGraph.load(path)
    assert bg2.src_num_nodes == 3 and bg2.dst_num_nodes == 4
    np.testing.assert_allclose(np.asarray(bg2.edge_feat["w"]),
                               np.arange(5, dtype=np.float32))


def test_bigraph_sampling():
    bg = make_bigraph()
    nbrs = bg.sample_successor([0, 2], max_degree=1, seed=0)
    assert len(nbrs[0]) == 1 and len(nbrs[1]) == 1
    assert nbrs[0][0] in (1, 3)


def test_bigraph_jit():
    bg = make_bigraph().tensor()

    @jax.jit
    def f(bg, x):
        return bg.send_recv(x, "sum")

    out = f(bg, bg.src_node_feat["h"])
    assert out.shape == (4, 2)


def test_bigraph_batched_dump_load_round_trip(tmp_path):
    """dump/load preserves disjoint-batching state (num_graph and the
    per-graph index arrays) — a round-tripped batch must not silently
    merge its subgraphs."""
    from pgl_tpu.bigraph import BiGraph
    import numpy as np
    g1 = BiGraph(np.array([[0, 1], [1, 0]]), 2, 2,
                 src_node_feat={"h": np.ones((2, 3), np.float32)})
    g2 = BiGraph(np.array([[0, 0], [2, 1], [1, 1]]), 3, 2,
                 src_node_feat={"h": np.zeros((3, 3), np.float32)})
    bg = BiGraph.disjoint([g1, g2])
    assert bg.num_graph == 2
    bg.dump(str(tmp_path / "bg"))
    r = BiGraph.load(str(tmp_path / "bg"))
    assert r.num_graph == 2
    np.testing.assert_array_equal(np.asarray(r.graph_src_node_id),
                                  np.asarray(bg.graph_src_node_id))
    np.testing.assert_array_equal(np.asarray(r.graph_edge_id),
                                  np.asarray(bg.graph_edge_id))
    np.testing.assert_array_equal(np.asarray(r.edges),
                                  np.asarray(bg.edges))
    # device batching stays int32 (the device-id invariant)
    t1, t2 = g1.tensor(), g2.tensor()
    bt = BiGraph.disjoint([t1, t2])
    assert bt.edges.dtype == np.int32
    import pytest
    with pytest.raises(ValueError):
        BiGraph.disjoint([])
