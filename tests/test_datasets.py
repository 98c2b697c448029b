"""Dataset loader tests against synthesized on-disk fixtures in the
reference file formats (no network in this environment)."""

import os
import pickle

import numpy as np
import pytest
import scipy.sparse as sp

from pgl_tpu.datasets import (CoraDataset, CitationDataset,
                              BlogCatalogDataset, RedditDataset,
                              community_graph, powerlaw_graph)


def test_cora_format(tmp_path):
    d = tmp_path / "cora"
    d.mkdir()
    # 5 papers, 3 features, 2 classes
    ids = [101, 202, 303, 404, 505]
    classes = ["AI", "DB", "AI", "DB", "AI"]
    with open(d / "cora.content", "w") as f:
        for i, (pid, c) in enumerate(zip(ids, classes)):
            feats = " ".join(str((i + j) % 2) for j in range(3))
            f.write(f"{pid} {feats} {c}\n")
    with open(d / "cora.cites", "w") as f:
        f.write("101 202\n202 303\n404 505\n")
    ds = CoraDataset(data_path=str(d))
    assert ds.graph.num_nodes == 5
    assert ds.num_classes == 2
    assert ds.y.shape == (5,)
    # symmetric + self loops
    edges = set(map(tuple, np.asarray(ds.graph.edges).tolist()))
    assert (0, 1) in edges and (1, 0) in edges and (0, 0) in edges


def test_citation_planetoid_format(tmp_path):
    d = tmp_path / "pubmed"
    d.mkdir()
    n_train, n_test, n_all, dim, ncls = 4, 3, 7, 5, 3
    rng = np.random.default_rng(0)
    x = sp.csr_matrix(rng.random((n_train, dim)).astype("float32"))
    allx = sp.csr_matrix(rng.random((n_all, dim)).astype("float32"))
    tx = sp.csr_matrix(rng.random((n_test, dim)).astype("float32"))
    y = np.eye(ncls)[rng.integers(0, ncls, n_train)]
    ally = np.eye(ncls)[rng.integers(0, ncls, n_all)]
    ty = np.eye(ncls)[rng.integers(0, ncls, n_test)]
    graph = {i: [(i + 1) % (n_all + n_test)] for i in range(n_all + n_test)}
    for name, obj in [("x", x), ("y", y), ("tx", tx), ("ty", ty),
                      ("allx", allx), ("ally", ally), ("graph", graph)]:
        with open(d / f"ind.pubmed.{name}", "wb") as f:
            pickle.dump(obj, f)
    with open(d / "ind.pubmed.test.index", "w") as f:
        for i in [8, 7, 9]:
            f.write(f"{i}\n")
    ds = CitationDataset("pubmed", data_path=str(d))
    assert ds.graph.num_nodes == 10
    assert ds.num_classes == ncls
    assert len(ds.test_index) == 3


def test_blogcatalog_format(tmp_path):
    d = tmp_path / "bc"
    d.mkdir()
    (d / "nodes.csv").write_text("1\n2\n3\n4\n")
    (d / "edges.csv").write_text("1,2\n2,3\n3,4\n")
    (d / "group-edges.csv").write_text("1,1\n2,2\n3,1\n4,3\n")
    ds = BlogCatalogDataset(data_path=str(d), seed=0)
    assert ds.graph.num_nodes == 4
    assert ds.graph.node_feat["group_id"].shape == (4, 39)
    assert len(ds.train_index) + len(ds.test_index) == 4


def test_reddit_format(tmp_path):
    d = tmp_path / "reddit"
    d.mkdir()
    n, dim = 12, 6
    rng = np.random.default_rng(0)
    adj = sp.random(n, n, density=0.3, format="csr")
    sp.save_npz(d / "reddit_adj.npz", adj)
    np.savez(d / "reddit.npz",
             feats=rng.random((n, dim)).astype("float32"),
             y_train=rng.integers(0, 41, 6), y_val=rng.integers(0, 41, 3),
             y_test=rng.integers(0, 41, 3),
             train_index=np.arange(6), val_index=np.arange(6, 9),
             test_index=np.arange(9, 12))
    ds = RedditDataset(data_path=str(d))
    assert ds.graph.num_nodes == 12
    assert ds.feature.shape == (12, 6)
    assert ds.num_classes == 41


def test_missing_files_helpful_error(tmp_path):
    with pytest.raises(FileNotFoundError, match="cora.content"):
        CoraDataset(data_path=str(tmp_path))


def test_synthetic_generators():
    g, labels = community_graph(200, 4, 8, seed=0)
    assert g.num_nodes == 200 and labels.shape == (200,)
    g = powerlaw_graph(500, avg_degree=6, feat_dim=4)
    assert g.num_edges == 3000
    # heavy tail: top node should absorb many edges
    assert int(g.indegree().max()) > 50


def test_arxiv_link_prediction_contract(tmp_path):
    """ArXivDataset remaps sparse SNAP ids densely and produces the
    reference's link-prediction split: half the undirected edges held
    out as pos_edges, an equal count of non-edges as neg_edges, the rest
    symmetrized into graph (reference pgl/dataset.py:338-383)."""
    from pgl_tpu.datasets.loaders import ArXivDataset
    import numpy as np

    rng = np.random.default_rng(0)
    ids = rng.choice(100000, 30, replace=False)      # sparse raw ids
    pairs = {(int(ids[i]), int(ids[j]))
             for i in range(30) for j in range(30)
             if i < j and rng.random() < 0.3}
    d = tmp_path / "arxiv"
    d.mkdir()
    with open(d / "arxiv.txt", "w") as f:
        f.write("# comment line\n")
        for u, v in pairs:
            f.write(f"{u}\t{v}\n")
    ds = ArXivDataset(data_path=str(d))
    n_bi = len(pairs)
    assert ds.graph.num_nodes == 30                  # densely remapped
    assert len(ds.pos_edges) == n_bi // 2
    assert len(ds.neg_edges) == n_bi // 2
    # graph holds the remaining half, symmetrized
    assert ds.graph.num_edges == 2 * (n_bi - n_bi // 2)
    # neg edges are true non-edges in the remapped space
    bi = {(min(a, b), max(a, b))
          for a, b in np.asarray(ds.graph.edges).tolist()} | {
          (min(a, b), max(a, b)) for a, b in ds.pos_edges}
    for u, v in ds.neg_edges:
        assert (min(u, v), max(u, v)) not in bi
