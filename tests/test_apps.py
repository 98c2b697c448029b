"""App-layer tests: UniMP/R-UniMP models, unsupervised engine, stream pool,
mp_reader."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pgl_tpu import Graph, HeterGraph
from pgl_tpu.datasets import community_graph
from pgl_tpu.models.unimp import UniMP, RUniMP


def test_unimp_forward_and_label_masking():
    g, y = community_graph(num_nodes=100, num_classes=4, feat_dim=16,
                           avg_degree=6, seed=0)
    gt = g.tensor()
    x = gt.node_feat["h"]
    label = jnp.asarray(y)
    mask = jnp.asarray(np.arange(100) < 50)
    model = UniMP(input_size=16, num_class=4, num_layers=2, hidden_size=8,
                  dropout=0.0)
    params = model.init(jax.random.key(0), gt, x, label, mask)
    out = model.apply(params, gt, x, label, mask)
    assert out.shape == (100, 4)
    # feeding labels must change the output vs an all-masked run
    out_nolabel = model.apply(params, gt, x, label,
                              jnp.zeros(100, bool))
    assert not np.allclose(np.asarray(out), np.asarray(out_nolabel))


def test_runimp_hetero():
    edges = {
        "cites": np.random.default_rng(0).integers(0, 50, (200, 2)),
        "refs": np.random.default_rng(1).integers(0, 50, (150, 2)),
    }
    hg = HeterGraph(edges, num_nodes=50).tensor()
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(50, 12)).astype(np.float32))
    model = RUniMP(input_size=12, num_class=3, etypes=["cites", "refs"],
                   num_layers=2, hidden_size=8, dropout=0.0)
    params = model.init(jax.random.key(0), hg, x)
    out = model.apply(params, hg, x)
    assert out.shape == (50, 3)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("neighbor_samples", [None, 4])
def test_unsupervised_trainer(neighbor_samples):
    from pgl_tpu.apps.unsupervised import UnsupervisedGraphTrainer
    g, labels = community_graph(num_nodes=300, num_classes=3, feat_dim=1,
                                avg_degree=8, seed=1)
    trainer = UnsupervisedGraphTrainer(
        g, embed_dim=32, neighbor_samples=neighbor_samples,
        pair_batch=1024, lr=2e-2)
    loss0 = trainer.train(epochs=1, walk_len=10, batch_nodes=300)
    loss1 = trainer.train(epochs=3, walk_len=10, batch_nodes=300)
    assert loss1 < loss0
    emb = trainer.embeddings()
    assert emb.shape == (300, 32)


def test_stream_pool():
    from pgl_tpu.utils.stream_pool import StreamPool
    pool = StreamPool(pool_size=2)
    host = np.arange(50, dtype=np.float32).reshape(10, 5)
    fut = pool.async_pull(host, [2, 4])
    rows = fut.result()
    np.testing.assert_allclose(np.asarray(rows), host[[2, 4]])
    pool.async_push(host, [0], jnp.full((1, 5), -1.0))
    pool.synchronize()
    np.testing.assert_allclose(host[0], -1.0)
    pool.close()


def test_mp_reader():
    from pgl_tpu.utils.mp_reader import multiprocess_reader

    def make(lo, hi):
        def reader():
            for i in range(lo, hi):
                yield {"x": np.full((2,), i)}
        return reader

    items = list(multiprocess_reader([make(0, 5), make(5, 9)]))
    vals = sorted(int(d["x"][0]) for d in items)
    assert vals == list(range(9))


@pytest.mark.parametrize("model_type", ["walk_based", "ego_sage",
                                        "gat", "gin"])
def test_graph4rec_trainer(model_type):
    from pgl_tpu.apps.graph4rec import Graph4RecTrainer
    from pgl_tpu.utils.config import Config
    rng = np.random.default_rng(0)
    n_u, n_i = 80, 120
    src = rng.integers(0, n_u, 600)
    dst = n_u + rng.integers(0, n_i, 600)
    hg = HeterGraph({"u2i": np.stack([src, dst], 1),
                     "i2u": np.stack([dst, src], 1)},
                    num_nodes=n_u + n_i,
                    node_types=[(i, "u" if i < n_u else "i")
                                for i in range(n_u + n_i)])
    cfg = Config({"model_type": model_type, "metapath": "u2i-i2u",
                  "walk_len": 8, "win_size": 2, "embed_dim": 16,
                  "lr": 0.02, "batch_pairs": 256, "neg_num": 3,
                  "sage_etype": "i2u", "samples": [3]})
    trainer = Graph4RecTrainer(cfg, graph=hg)
    l0 = trainer.train(epochs=1)
    l1 = trainer.train(epochs=3)
    assert l1 < l0
    assert trainer.embeddings().shape == (200, 16)


def test_pglbox_out_of_core(tmp_path):
    """Disk-tiered PGLBox engine: edge-file ingestion -> mmap'd CSR ->
    pass-based training with begin_pass/end_pass write-back."""
    from pgl_tpu.apps.pglbox import DistGraph, DistEmbedding, PGLBoxTrainer

    rng = np.random.default_rng(0)
    edges = rng.integers(0, 80, (600, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    ef = tmp_path / "edges.txt"
    with open(ef, "w") as f:
        for s, d in edges:
            f.write(f"{s}\t{d}\n")

    dg = DistGraph.from_edge_file(str(ef), str(tmp_path / "g"),
                                  symmetry=True)
    assert dg.num_nodes == 80 and dg.num_edges == 2 * len(edges)
    # the CSR must actually be memory-mapped (the disk tier)
    assert isinstance(np.asarray(dg.graph.adj_src_index.sorted_v)
                      .base, np.memmap) or isinstance(
        dg.graph.adj_src_index.sorted_v, np.memmap)

    tr = PGLBoxTrainer(dg, str(tmp_path / "emb"),
                       config=dict(emb_size=8, walk_len=6, win_size=2,
                                   pass_nodes=40, epochs=2,
                                   batch_pairs=256, lr=0.1))
    before = tr.embeddings().copy()
    tr.train()
    after = tr.embeddings()
    # pass write-back mutated the on-disk table
    assert (tmp_path / "emb" / "weight.npy").exists()
    assert not np.allclose(before, after)

    # infer pass: stream every node's embedding to sharded npz files
    shards = tr.infer(str(tmp_path / "infer"), batch_nodes=32)
    assert shards == -(-80 // 32)
    got = np.concatenate([
        np.load(tmp_path / "infer" / f"part-{i:05d}.npz")["emb"]
        for i in range(shards)])
    np.testing.assert_allclose(got, after)

    # begin_pass/end_pass contract: double begin raises, capacity drop works
    emb = DistEmbedding(80, 8, str(tmp_path / "emb2"), capacity=4)
    t = emb.begin_pass(np.array([3, 3, 3, 5, 5, 7, 9, 11]))
    assert t.shape == (4, 8)
    loc = emb.local_ids(np.array([3, 5, 999]))
    assert loc[0] >= 0 and loc[1] >= 0 and loc[2] == -1
    with pytest.raises(RuntimeError):
        emb.begin_pass([1])
    emb.end_pass(t)


def test_graph4rec_presets_train():
    """Every preset recipe must instantiate and take a training epoch
    (reference user_configs/*.yaml surface)."""
    from pgl_tpu.apps.graph4rec import Graph4RecTrainer, PRESETS
    from pgl_tpu import Graph
    rng = np.random.default_rng(0)
    g = Graph(rng.integers(0, 60, (500, 2)), num_nodes=60)
    for name in ("deepwalk", "node2vec", "lightgcn"):
        tr = Graph4RecTrainer.from_preset(
            name, graph=g, num_nodes=60, epochs=1, walk_len=6,
            batch_pairs=128, walks_per_node=1)
        loss = tr.train(epochs=1)
        assert np.isfinite(loss)
        emb = tr.embeddings()
        assert emb.shape == (60, 64)
    assert set(PRESETS) >= {"deepwalk", "node2vec", "metapath2vec",
                            "graphsage", "lightgcn", "gat", "gin",
                            "gatne", "graphsage_with_features",
                            "metapath2vec_with_features"}


def _bipartite_hetergraph(n_u=60, n_i=90, feat_dim=0, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_u, 500)
    dst = n_u + rng.integers(0, n_i, 500)
    node_feat = {}
    if feat_dim:
        node_feat["h"] = rng.normal(size=(n_u + n_i, feat_dim)).astype(
            np.float32)
    return HeterGraph({"u2i": np.stack([src, dst], 1),
                       "i2u": np.stack([dst, src], 1)},
                      num_nodes=n_u + n_i,
                      node_types=[(i, "u" if i < n_u else "i")
                                  for i in range(n_u + n_i)],
                      node_feat=node_feat)


def test_graph4rec_gatne_trainer():
    """GATNE-T: per-etype edge embeddings + cross-etype attention."""
    from pgl_tpu.apps.graph4rec import Graph4RecTrainer
    hg = _bipartite_hetergraph()
    tr = Graph4RecTrainer.from_preset("gatne", graph=hg, walk_len=6,
                                      batch_pairs=256, walks_per_node=1,
                                      embed_dim=16, edge_dim=4, att_dim=4)
    l0 = tr.train(epochs=1)
    l1 = tr.train(epochs=3)
    assert np.isfinite(l0) and l1 < l0
    assert tr.params["edge_emb"].shape == (150, 2, 4)


def test_graph4rec_with_features_presets():
    """*_with_features presets project node side features into the
    encoder; a graph without features raises a clear error."""
    from pgl_tpu.apps.graph4rec import Graph4RecTrainer
    hg = _bipartite_hetergraph(feat_dim=12)
    for name in ("graphsage_with_features", "metapath2vec_with_features"):
        tr = Graph4RecTrainer.from_preset(name, graph=hg, walk_len=6,
                                          batch_pairs=256,
                                          walks_per_node=1, embed_dim=16,
                                          samples=[3])
        loss = tr.train(epochs=1)
        assert np.isfinite(loss)
        assert tr.params["w_feat"].shape == (12, 16)

    bare = _bipartite_hetergraph()
    with pytest.raises(ValueError, match="node_feat"):
        Graph4RecTrainer.from_preset("graphsage_with_features", graph=bare)


def test_graph4rec_deepwalk_on_typed_graph():
    """deepwalk preset on a typed HeterGraph must actually train (it
    previously derived first_node_type 'None' from the absent metapath
    and silently ran zero steps), and tail batches below batch_pairs
    must still step (masked padding)."""
    from pgl_tpu import HeterGraph
    from pgl_tpu.apps.graph4rec import Graph4RecTrainer

    rng = np.random.default_rng(0)
    hg = HeterGraph({"u2u": rng.integers(0, 40, (200, 2))}, num_nodes=40,
                    node_types=np.array(["u"] * 40, dtype=object))
    tr = Graph4RecTrainer.from_preset("deepwalk", graph=hg)
    l1 = tr.train(epochs=1)
    l2 = tr.train(epochs=3)
    assert l1 > 0 and l2 < l1     # steps ran, loss decreases


def test_pglbox_resident_tier_persists(tmp_path, monkeypatch):
    """HBM-resident embedding tier (forced on CPU via env): training must
    persist to the mmap backing store — the documented contract is that
    reopening the path sees the trained table (regression: end_pass only
    updated the device copy and train() never flushed)."""
    from pgl_tpu.apps.pglbox import DistGraph, PGLBoxTrainer
    from pgl_tpu.utils.shared_embedding import SharedEmbedding

    monkeypatch.setenv("PGL_TPU_PGLBOX_EMB_RESIDENT", "1")
    rng = np.random.default_rng(1)
    edges = rng.integers(0, 60, (500, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    ef = tmp_path / "edges.txt"
    with open(ef, "w") as f:
        for s, d in edges:
            f.write(f"{s}\t{d}\n")
    dg = DistGraph.from_edge_file(str(ef), str(tmp_path / "g"),
                                  symmetry=True)
    tr = PGLBoxTrainer(dg, str(tmp_path / "emb"),
                       config=dict(emb_size=8, walk_len=6, win_size=2,
                                   pass_nodes=30, epochs=1,
                                   batch_pairs=256, lr=0.1))
    assert tr.embedding._resident
    before = np.array(np.load(tmp_path / "emb" / "weight.npy",
                              mmap_mode="r"))
    tr.train()
    # in-memory view trained
    after_mem = tr.embeddings()
    assert not np.allclose(before, after_mem)
    # AND the on-disk store reopened from the path matches it
    reopened = SharedEmbedding(60, 8, str(tmp_path / "emb"), lr=0.1)
    np.testing.assert_allclose(np.asarray(reopened.weight), after_mem)
