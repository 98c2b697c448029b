"""Format-true miniature dataset fixtures driven through the REAL example
commands (VERDICT r2 #5): the exact CLIs pinned in docs/ACCURACY.md run
unmodified against fixture paths and must beat an accuracy floor.

This proves the pinned commands — loader → split → train → eval — not just
the loader parsing (tests/test_datasets.py covers that). Formats match the
reference loaders at ``pgl/dataset.py:62-523``.
"""

import gzip
import os
import pickle
import re
import subprocess
import sys

import numpy as np
import pytest
import scipy.sparse as sp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _community(n, ncls, deg, seed, p_intra=0.9):
    """Edges + labels with planted communities (learnable by any GNN)."""
    rng = np.random.default_rng(seed)
    y = rng.integers(0, ncls, n)
    by_cls = [np.flatnonzero(y == c) for c in range(ncls)]
    src = rng.integers(0, n, n * deg)
    dst = np.empty_like(src)
    intra = rng.random(n * deg) < p_intra
    for i, s in enumerate(src):
        pool = by_cls[y[s]] if intra[i] else np.arange(n)
        dst[i] = pool[rng.integers(0, len(pool))]
    return np.stack([src, dst], 1), y


def _words(y, ncls, dim, seed, p_on=0.6, p_off=0.05):
    """Binary bag-of-words with a per-class block signal."""
    rng = np.random.default_rng(seed)
    n = len(y)
    block = dim // ncls
    w = (rng.random((n, dim)) < p_off).astype(np.int64)
    for c in range(ncls):
        rows = y == c
        w[np.ix_(rows, np.arange(c * block, (c + 1) * block))] = (
            rng.random((rows.sum(), block)) < p_on).astype(np.int64)
    return w


def _run(cmd, timeout=420):
    env = dict(os.environ, PGL_TPU_PLATFORM="cpu", JAX_PLATFORMS="cpu",
               PYTHONPATH=ROOT)
    env.pop("XLA_FLAGS", None)
    res = subprocess.run([sys.executable] + cmd, capture_output=True,
                         text=True, timeout=timeout, env=env, cwd=ROOT)
    assert res.returncode == 0, f"{cmd}\n{res.stdout}\n{res.stderr}"
    return res.stdout


def _acc(out, pattern=r"test acc:?\s+([0-9.]+)"):
    m = re.findall(pattern, out)
    assert m, out
    return float(m[-1])


def test_citation_benchmark_command_cora_format(tmp_path):
    """examples/citation_benchmark/train.py --data-path <cora.content/
    cora.cites fixture> (loader split: train=first 140, test=500:1500)."""
    n, ncls, dim = 700, 3, 30
    edges, y = _community(n, ncls, 4, seed=0)
    w = _words(y, ncls, dim, seed=1)
    names = ["AI", "DB", "ML"]
    d = tmp_path / "cora"
    d.mkdir()
    with open(d / "cora.content", "w") as f:
        for i in range(n):
            f.write(f"{1000 + i} " + " ".join(map(str, w[i]))
                    + f" {names[y[i]]}\n")
    with open(d / "cora.cites", "w") as f:
        for u, v in edges:
            f.write(f"{1000 + u} {1000 + v}\n")
    out = _run(["examples/citation_benchmark/train.py", "--model", "GCN",
                "--dataset", "cora", "--data-path", str(d),
                "--epochs", "120"])
    assert _acc(out) > 0.75, out


def test_citation_benchmark_command_planetoid_format(tmp_path):
    """examples/citation_benchmark/train.py --dataset pubmed against the
    Planetoid pickle fixture (ind.pubmed.* files)."""
    n_all, n_test, ncls, dim = 700, 120, 3, 30
    n = n_all + n_test
    edges, y = _community(n, ncls, 4, seed=2)
    feats = _words(y, ncls, dim, seed=3).astype(np.float32)
    onehot = np.eye(ncls, dtype=np.float32)[y]

    graph = {i: [] for i in range(n)}
    for u, v in edges:
        graph[int(u)].append(int(v))

    n_train = 80
    x = sp.csr_matrix(feats[:n_train])
    yv = onehot[:n_train]
    allx = sp.csr_matrix(feats[:n_all])
    ally = onehot[:n_all]
    # test rows live at positions n_all.. in the final graph; the .tx rows
    # are stored in test.index order (shuffled, like the real files)
    test_order = np.random.default_rng(4).permutation(n_test)
    tx = sp.csr_matrix(feats[n_all + test_order])
    ty = onehot[n_all + test_order]

    d = tmp_path / "pubmed"
    d.mkdir()
    for name, obj in [("x", x), ("y", yv), ("tx", tx), ("ty", ty),
                      ("allx", allx), ("ally", ally), ("graph", graph)]:
        with open(d / f"ind.pubmed.{name}", "wb") as f:
            pickle.dump(obj, f)
    with open(d / "ind.pubmed.test.index", "w") as f:
        for i in test_order:
            f.write(f"{n_all + i}\n")

    out = _run(["examples/citation_benchmark/train.py", "--model", "GCN",
                "--dataset", "pubmed", "--data-path", str(d),
                "--epochs", "120"])
    assert _acc(out) > 0.75, out


def test_graphsage_command_reddit_format(tmp_path):
    """examples/graphsage/train.py --data-path <reddit npz fixture>:
    minibatch pipeline (Dataloader workers + graphsage_sample) end-to-end."""
    n, ncls, dim = 600, 3, 32
    edges, y = _community(n, ncls, 8, seed=5)
    rng = np.random.default_rng(6)
    feats = np.eye(ncls, dtype=np.float32)[y] @ np.abs(
        rng.normal(1.0, 0.2, (ncls, dim))).astype(np.float32)
    feats += rng.normal(0, 0.3, feats.shape).astype(np.float32)

    adj = sp.csr_matrix(
        (np.ones(len(edges)), (edges[:, 0], edges[:, 1])), shape=(n, n))
    d = tmp_path / "reddit"
    d.mkdir()
    sp.save_npz(d / "reddit_adj.npz", adj)
    perm = rng.permutation(n)
    tr, va, te = perm[:400], perm[400:500], perm[500:]
    np.savez(d / "reddit.npz", feats=feats,
             y_train=y[tr], y_val=y[va], y_test=y[te],
             train_index=tr, val_index=va, test_index=te)

    out = _run(["examples/graphsage/train.py", "--data-path", str(d),
                "--epochs", "3", "--batch-size", "64",
                "--samples", "10", "5", "--num-workers", "1"])
    assert _acc(out) > 0.7, out


def test_unimp_command_ogb_arxiv_format(tmp_path):
    """examples/unimp/train.py --data-path <extracted-OGB-layout fixture>:
    raw/*.csv.gz + split/time/*.csv.gz parsed without the ogb package."""
    n, ncls, dim = 500, 3, 24
    edges, y = _community(n, ncls, 5, seed=7)
    rng = np.random.default_rng(8)
    feats = np.eye(ncls, dtype=np.float32)[y] @ np.abs(
        rng.normal(1.0, 0.2, (ncls, dim))).astype(np.float32)
    feats += rng.normal(0, 0.3, feats.shape).astype(np.float32)

    d = tmp_path / "ogbn_arxiv"
    raw = d / "raw"
    split = d / "split" / "time"
    raw.mkdir(parents=True)
    split.mkdir(parents=True)

    def gz(path, arr, fmt):
        with gzip.open(path, "wt") as f:
            for row in np.atleast_2d(arr):
                f.write(",".join(fmt % v for v in np.atleast_1d(row)) + "\n")

    gz(raw / "edge.csv.gz", edges, "%d")
    gz(raw / "node-feat.csv.gz", feats, "%.6f")
    gz(raw / "node-label.csv.gz", y.reshape(-1, 1), "%d")
    gz(raw / "num-node-list.csv.gz", np.array([[n]]), "%d")
    perm = rng.permutation(n)
    gz(split / "train.csv.gz", perm[:300].reshape(-1, 1), "%d")
    gz(split / "valid.csv.gz", perm[300:400].reshape(-1, 1), "%d")
    gz(split / "test.csv.gz", perm[400:].reshape(-1, 1), "%d")

    out = _run(["examples/unimp/train.py", "--data-path", str(d),
                "--epochs", "60", "--hidden", "32"])
    assert _acc(out) > 0.75, out
