"""Synthetic graph generators for tests and benchmarks (no-network stand-ins
for the reference's downloaded datasets, ``pgl/dataset.py``)."""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..graph import Graph

__all__ = ["random_graph", "powerlaw_graph", "community_graph",
           "blogcatalog_shaped_graph",
           "cora_shaped_graph"]


def random_graph(num_nodes: int, num_edges: int, feat_dim: int = 0,
                 seed: int = 0, weighted: bool = False) -> Graph:
    """Uniform random directed multigraph."""
    rng = np.random.default_rng(seed)
    edges = rng.integers(0, num_nodes, (num_edges, 2))
    node_feat = {}
    if feat_dim:
        node_feat["h"] = rng.normal(size=(num_nodes, feat_dim)).astype(
            np.float32)
    edge_feat = {}
    if weighted:
        edge_feat["w"] = rng.random(num_edges).astype(np.float32)
    return Graph(edges, num_nodes=num_nodes, node_feat=node_feat,
                 edge_feat=edge_feat)


def powerlaw_graph(num_nodes: int, avg_degree: int = 10, alpha: float = 1.5,
                   feat_dim: int = 0, seed: int = 0) -> Graph:
    """Preferential-attachment-flavored graph: dst endpoints drawn from a
    Zipf-like distribution so in-degree is heavy-tailed (the hub-node skew
    that stresses segment reduces, SURVEY.md §7 'Scatter performance')."""
    rng = np.random.default_rng(seed)
    num_edges = num_nodes * avg_degree
    ranks = np.arange(1, num_nodes + 1, dtype=np.float64)
    probs = ranks ** -alpha
    probs /= probs.sum()
    dst = rng.choice(num_nodes, size=num_edges, p=probs)
    src = rng.integers(0, num_nodes, num_edges)
    edges = np.stack([src, dst], axis=1)
    node_feat = {}
    if feat_dim:
        node_feat["h"] = rng.normal(size=(num_nodes, feat_dim)).astype(
            np.float32)
    return Graph(edges, num_nodes=num_nodes, node_feat=node_feat)


def community_graph(num_nodes: int = 400, num_classes: int = 2,
                    feat_dim: int = 16, avg_degree: int = 8,
                    noise: float = 0.9, p_inter: float = 0.1,
                    seed: int = 0):
    """Planted-partition graph with class-correlated features; returns
    ``(graph, labels)`` — the learnability fixture used by /verify."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, num_nodes)
    src = np.repeat(np.arange(num_nodes), avg_degree)
    dst = rng.integers(0, num_nodes, num_nodes * avg_degree)
    keep = (labels[src] == labels[dst]) | (rng.random(len(src)) < p_inter)
    edges = np.stack([src[keep], dst[keep]], axis=1)
    feat = (np.eye(num_classes)[labels] @
            rng.normal(size=(num_classes, feat_dim)) +
            noise * rng.normal(size=(num_nodes, feat_dim))).astype(np.float32)
    g = Graph(edges, num_nodes=num_nodes, node_feat={"h": feat})
    return g, labels.astype(np.int32)


def cora_shaped_graph(seed: int = 0):
    """A graph with Cora's shape (2708 nodes, ~10556 directed edges, 1433-d
    features, 7 classes) for benchmarking against the reference's published
    Cora epoch times (BASELINE.md). Returns (graph, labels, train_index)."""
    rng = np.random.default_rng(seed)
    g, labels = community_graph(num_nodes=2708, num_classes=7,
                                feat_dim=1433, avg_degree=4, noise=1.2,
                                p_inter=0.15, seed=seed)
    train_index = rng.choice(2708, size=140, replace=False).astype(np.int32)
    return g, labels, train_index


def blogcatalog_shaped_graph(num_nodes: int = 2000, num_groups: int = 12,
                             avg_degree: int = 16, p_inter: float = 0.05,
                             seed: int = 0):
    """Multi-label planted-community graph shaped like BlogCatalog (the
    reference's distributed-deepwalk benchmark, ``examples/deepwalk/
    README.md``): each node joins 1-3 overlapping groups; edges prefer
    group-mates. Returns ``(graph, labels)`` with ``labels`` a
    [num_nodes, num_groups] 0/1 multi-label matrix (BlogCatalog is
    evaluated with multi-label MacroF1)."""
    rng = np.random.default_rng(seed)
    labels = np.zeros((num_nodes, num_groups), np.int32)
    primary = rng.integers(0, num_groups, num_nodes)
    labels[np.arange(num_nodes), primary] = 1
    extra = rng.random(num_nodes) < 0.4
    labels[np.arange(num_nodes)[extra],
           rng.integers(0, num_groups, int(extra.sum()))] = 1
    src = np.repeat(np.arange(num_nodes), avg_degree)
    dst = rng.integers(0, num_nodes, num_nodes * avg_degree)
    share = (labels[src] & labels[dst]).any(axis=1)
    keep = share | (rng.random(len(src)) < p_inter)
    e = np.stack([src[keep], dst[keep]], axis=1)
    e = np.concatenate([e, e[:, ::-1]], axis=0)          # undirected
    g = Graph(e, num_nodes=num_nodes)
    return g, labels
