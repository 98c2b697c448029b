"""Sampling: layered neighbor sampling, walks, subgraph extraction
(reference: ``pgl/sampling/``)."""

from .sage import (graphsage_sample, NeighborSampler,
                   HeteroNeighborSampler, sample_neighbors_padded)
from .walk import (random_walk, node2vec_walk, node2vec_walk_plus,
                   metapath_randomwalk,
                   metapath_randomwalk_dist)
from .custom import subgraph, graph_saint_node_sample

__all__ = ["graphsage_sample", "NeighborSampler", "HeteroNeighborSampler",
           "sample_neighbors_padded", "graph_saint_node_sample",
           "random_walk", "node2vec_walk", "node2vec_walk_plus",
           "metapath_randomwalk",
           "metapath_randomwalk_dist", "subgraph"]
