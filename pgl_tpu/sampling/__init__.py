"""Sampling: layered neighbor sampling, walks, subgraph extraction
(reference: ``pgl/sampling/``)."""

from .sage import graphsage_sample, NeighborSampler, sample_neighbors_padded
from .walk import random_walk, node2vec_walk
from .custom import subgraph

__all__ = ["graphsage_sample", "NeighborSampler", "sample_neighbors_padded",
           "random_walk", "node2vec_walk", "subgraph"]
