"""Application mini-frameworks (reference: ``apps/``): GNNAutoScale
historical embeddings, large-scale unsupervised graph engines, rec/KG
toolkits built on the core framework."""

from . import gnn_autoscale

__all__ = ["gnn_autoscale"]
