"""Sampling: layered neighbor sampling, walks, subgraph extraction
(reference: ``pgl/sampling/``)."""

from .sage import (graphsage_sample, NeighborSampler,
                   HeteroNeighborSampler, sample_neighbors_padded,
                   make_padded_batch_fn, pack_padded_batch,
                   unpack_padded_batch)
from .walk import (random_walk, node2vec_walk, node2vec_walk_plus,
                   metapath_randomwalk,
                   metapath_randomwalk_dist)
from .device_walk import DeviceWalker, skipgram_pairs
from .custom import (subgraph, graph_saint_node_sample,
                     graph_saint_random_walk_sample,
                     pinsage_sample, random_walk_with_restart)

__all__ = ["DeviceWalker", "skipgram_pairs", "graphsage_sample", "NeighborSampler", "HeteroNeighborSampler",
           "sample_neighbors_padded", "make_padded_batch_fn",
           "pack_padded_batch", "unpack_padded_batch",
           "graph_saint_node_sample",
           "graph_saint_random_walk_sample", "pinsage_sample",
           "random_walk_with_restart",
           "random_walk", "node2vec_walk", "node2vec_walk_plus",
           "metapath_randomwalk",
           "metapath_randomwalk_dist", "subgraph"]
